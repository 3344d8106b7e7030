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
