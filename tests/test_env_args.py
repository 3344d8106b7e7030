"""Env-var flag fallbacks (the LLAMA_ARG_* contract, common/arg.cpp)."""

import argparse

from prima_tpu.utils.args import apply_env_defaults


def _parser():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--flash-attn", action="store_true")
    ap.add_argument("-m", "--model", required=True)
    return ap


def test_env_fallback_and_cli_precedence(monkeypatch):
    monkeypatch.setenv("PRIMA_ARG_CTX_SIZE", "2048")
    monkeypatch.setenv("LLAMA_ARG_TEMP", "0.1")
    monkeypatch.setenv("PRIMA_ARG_FLASH_ATTN", "1")
    monkeypatch.setenv("PRIMA_ARG_MODEL", "from-env.gguf")
    ap = _parser()
    apply_env_defaults(ap)
    a = ap.parse_args([])  # required -m satisfied by env
    assert a.ctx_size == 2048
    assert a.temp == 0.1
    assert a.flash_attn is True
    assert a.model == "from-env.gguf"
    # explicit CLI flag wins over env
    a2 = ap.parse_args(["-c", "64", "--temp", "1.5", "-m", "x.gguf"])
    assert a2.ctx_size == 64 and a2.temp == 1.5 and a2.model == "x.gguf"


def test_prima_prefix_beats_llama(monkeypatch):
    monkeypatch.setenv("LLAMA_ARG_CTX_SIZE", "128")
    monkeypatch.setenv("PRIMA_ARG_CTX_SIZE", "256")
    ap = _parser()
    apply_env_defaults(ap)
    assert ap.parse_args(["-m", "x"]).ctx_size == 256


def test_bad_env_value_errors(monkeypatch):
    monkeypatch.setenv("PRIMA_ARG_CTX_SIZE", "not-a-number")
    ap = _parser()
    import pytest

    with pytest.raises(SystemExit):
        apply_env_defaults(ap)


def test_falsy_boolean(monkeypatch):
    monkeypatch.setenv("PRIMA_ARG_FLASH_ATTN", "off")
    ap = _parser()
    apply_env_defaults(ap)
    assert ap.parse_args(["-m", "x"]).flash_attn is False
