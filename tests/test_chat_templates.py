"""Chat template builtins — format parity with llama_chat_apply_template
(reference src/llama.cpp:21668; expected strings from its test suite)."""

import pytest

from prima_tpu.server.chat import _BUILTINS, apply_chat_template, detect_from_template

MSGS = [
    {"role": "system", "content": "You are a helpful assistant"},
    {"role": "user", "content": "Hello"},
    {"role": "assistant", "content": "Hi there"},
    {"role": "user", "content": "Who are you"},
]


def _render(name):
    return _BUILTINS[name](MSGS, True)


def test_chatml():
    out = _render("chatml")
    assert out.startswith("<|im_start|>system\nYou are a helpful assistant<|im_end|>\n")
    assert out.endswith("<|im_start|>assistant\n")


def test_phi3():
    out = _render("phi3")
    assert "<|user|>\nHello<|end|>\n" in out
    assert out.endswith("<|assistant|>\n")


def test_zephyr():
    out = _render("zephyr")
    assert "<|user|>\nHello<|endoftext|>\n" in out
    assert out.endswith("<|assistant|>\n")


def test_gemma():
    out = _render("gemma")
    # system content merges into the first user turn
    assert out.startswith("<start_of_turn>user\nYou are a helpful assistant\n\nHello<end_of_turn>\n")
    assert "<start_of_turn>model\nHi there<end_of_turn>\n" in out
    assert out.endswith("<start_of_turn>model\n")


def test_command_r():
    out = _render("command-r")
    assert out.startswith("<|START_OF_TURN_TOKEN|><|SYSTEM_TOKEN|>You are a helpful assistant<|END_OF_TURN_TOKEN|>")
    assert out.endswith("<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>")


def test_vicuna():
    out = _render("vicuna")
    assert "USER: Hello\n" in out and "ASSISTANT: Hi there</s>\n" in out
    assert out.endswith("ASSISTANT:")


def test_openchat():
    out = _render("openchat")
    assert "GPT4 Correct User: Hello<|end_of_turn|>" in out
    assert out.endswith("GPT4 Correct Assistant:")


def test_deepseek2():
    out = _render("deepseek2")
    assert "User: Hello\n\n" in out
    assert "Assistant: Hi there<｜end▁of▁sentence｜>" in out


def test_exaone3():
    out = _render("exaone3")
    assert "[|user|]Hello\n" in out
    assert out.endswith("[|assistant|]")


def test_minicpm():
    out = _render("minicpm")
    assert "<用户>Hello<AI>" in out


def test_marker_detection():
    assert detect_from_template("{{ '<|im_start|>' ... }}") == "chatml"
    assert detect_from_template("... <start_of_turn> ...") == "gemma"
    assert detect_from_template("{% if x %}[INST]{% endif %}") == "llama2"
    assert detect_from_template("### Instruction:") == "deepseek"
    assert detect_from_template("totally unknown") is None


def test_apply_with_named_template():
    out = apply_chat_template(MSGS, template="gemma")
    assert out.endswith("<start_of_turn>model\n")


def test_apply_jinja_roundtrip():
    pytest.importorskip("jinja2")
    tmpl = ("{% for m in messages %}<{{ m.role }}>{{ m.content }}</>{% endfor %}"
            "{% if add_generation_prompt %}<assistant>{% endif %}")
    out = apply_chat_template(MSGS, template=tmpl)
    assert out.startswith("<system>You are a helpful assistant</>")
    assert out.endswith("<assistant>")


def test_chatglm3():
    out = _BUILTINS["chatglm3"]([{"role": "user", "content": "hi"}], True)
    assert out == "[gMASK]sop<|user|>\n hi<|assistant|>"
    assert detect_from_template("... [gMASK]sop ...") == "chatglm3"
    assert detect_from_template("... [gMASK]<sop> ...") == "chatglm4"


def test_llama2_variants_match_reference():
    """The four llama2 template-content variants produce the reference's
    exact strings (test-chat-template.cpp expectations for
    Mistral-7B-Instruct-v0.2, mistralai official, and TheBloke vigogne)."""
    from prima_tpu.server.chat import apply_chat_template

    msgs = [
        {"role": "system", "content": "You are a helpful assistant"},
        {"role": "user", "content": "Hello"},
        {"role": "assistant", "content": "Hi there"},
        {"role": "user", "content": "Who are you"},
        {"role": "assistant", "content": "   I am an assistant   "},
        {"role": "user", "content": "Another question"},
    ]
    # Mistral-7B-Instruct-v0.2 (no <<SYS>>, no space around, no strip)
    t_mistral = ("{{ bos_token }}{% for message in messages %}"
                 "{% if message['role'] == 'user' %}{{ '[INST] ' + "
                 "message['content'] + ' [/INST]' }}{% elif message['role']"
                 " == 'assistant' %}{{ message['content'] + eos_token}}"
                 "{% endif %}{% endfor %}")
    want = ("[INST] You are a helpful assistant\nHello [/INST]Hi there</s>"
            "[INST] Who are you [/INST]   I am an assistant   </s>"
            "[INST] Another question [/INST]")
    # force the non-jinja detection path (no jinja2 semantics needed here)
    from prima_tpu.server import chat as chat_mod

    got = chat_mod._llama2_from_tmpl(t_mistral)(msgs, True)
    assert got == want

    # mistralai official: <<SYS>> + bos inside history + space around
    t_official = ("bos_token + '[INST] ' ... '<<SYS>>\\n' ... "
                  "' '  + messages[idx]['content'] + ' ' + eos_token")
    got = chat_mod._llama2(msgs, True, support_system=True,
                           space_around=True, bos_inside=True)
    want = ("[INST] <<SYS>>\nYou are a helpful assistant\n<</SYS>>\n\n"
            "Hello [/INST] Hi there </s><s>[INST] Who are you [/INST]"
            "    I am an assistant    </s><s>[INST] Another question [/INST]")
    assert got == want

    # vigogne: <<SYS>> + strip, no bos-inside, space around
    got = chat_mod._llama2(msgs, True, support_system=True,
                           space_around=True, strip=True)
    want = ("[INST] <<SYS>>\nYou are a helpful assistant\n<</SYS>>\n\n"
            "Hello [/INST] Hi there </s>[INST] Who are you [/INST]"
            " I am an assistant </s>[INST] Another question [/INST]")
    assert got == want

    # named builtins: llama2 (no system support), single message
    got = apply_chat_template([{"role": "user", "content": "How are you"}],
                              template="llama2")
    assert got == "[INST] How are you [/INST]"
