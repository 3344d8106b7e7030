"""Chat template application.

The analogue of llama_chat_apply_template (reference src/llama.cpp:21668):
prefer the GGUF's embedded `tokenizer.chat_template` (rendered with jinja2),
fall back to a detected builtin (chatml / llama2 / llama3), default chatml.
"""

from __future__ import annotations

from typing import Any


def _render_jinja(template: str, messages: list[dict], add_generation_prompt: bool,
                  bos: str = "", eos: str = "") -> str:
    import jinja2

    env = jinja2.Environment(loader=jinja2.BaseLoader(), keep_trailing_newline=True)

    def raise_exception(msg):
        raise jinja2.TemplateError(msg)

    tmpl = env.from_string(template)
    return tmpl.render(
        messages=messages,
        add_generation_prompt=add_generation_prompt,
        bos_token=bos,
        eos_token=eos,
        raise_exception=raise_exception,
    )


def _chatml(messages: list[dict], add_generation_prompt: bool) -> str:
    out = []
    for m in messages:
        out.append(f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n")
    if add_generation_prompt:
        out.append("<|im_start|>assistant\n")
    return "".join(out)


def _llama3(messages: list[dict], add_generation_prompt: bool) -> str:
    out = []
    for m in messages:
        out.append(f"<|start_header_id|>{m['role']}<|end_header_id|>\n\n{m['content']}<|eot_id|>")
    if add_generation_prompt:
        out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
    return "".join(out)


def _llama2(messages: list[dict], add_generation_prompt: bool) -> str:
    out = []
    system = ""
    for m in messages:
        if m["role"] == "system":
            system = m["content"]
        elif m["role"] == "user":
            content = m["content"]
            if system:
                content = f"<<SYS>>\n{system}\n<</SYS>>\n\n{content}"
                system = ""
            out.append(f"[INST] {content} [/INST]")
        else:
            out.append(f" {m['content']} ")
    return "".join(out)


_BUILTINS = {"chatml": _chatml, "llama2": _llama2, "llama3": _llama3}


def detect_builtin(vocab) -> str:
    toks = vocab.token_to_id
    if "<|start_header_id|>" in toks:
        return "llama3"
    if "<|im_start|>" in toks:
        return "chatml"
    if "[INST]" in toks or vocab.model == "llama":
        return "llama2"
    return "chatml"


def apply_chat_template(
    messages: list[dict[str, Any]],
    template: str | None = None,
    vocab=None,
    add_generation_prompt: bool = True,
) -> str:
    msgs = [{"role": m["role"], "content": m["content"]} for m in messages]
    if template and template not in _BUILTINS:
        bos = vocab.tokens[vocab.bos_id] if vocab and vocab.bos_id >= 0 else ""
        eos = vocab.tokens[vocab.eos_id] if vocab and vocab.eos_id >= 0 else ""
        try:
            return _render_jinja(template, msgs, add_generation_prompt, bos, eos)
        except Exception:
            pass  # fall through to builtins
    name = template if template in _BUILTINS else (detect_builtin(vocab) if vocab else "chatml")
    return _BUILTINS[name](msgs, add_generation_prompt)
