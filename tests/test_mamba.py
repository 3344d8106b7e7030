"""Mamba (selective SSM): HF conversion + logit parity + stateful decode."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from test_convert_hf import _write_tokenizer_json  # noqa: E402

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)


@pytest.fixture(scope="module")
def mamba_gguf(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mamba"))
    cfg = transformers.MambaConfig(
        vocab_size=128, hidden_size=32, state_size=8, num_hidden_layers=2,
        conv_kernel=4, expand=2, time_step_rank=4, use_cache=False,
    )
    torch.manual_seed(0)
    model = transformers.MambaForCausalLM(cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=True)
    _write_tokenizer_json(d, cfg.vocab_size)

    from prima_tpu.tools.convert_hf import convert_hf_to_gguf

    dst = os.path.join(d, "mamba.gguf")
    n = convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w"))
    assert n > 0
    return dst, model


def test_mamba_logit_parity(mamba_gguf):
    from prima_tpu.models.mamba import MambaRuntime, mamba_forward

    dst, hf_model = mamba_gguf
    rt = MambaRuntime.load(dst)
    assert rt.cfg.d_inner == 64 and rt.cfg.d_state == 8 and rt.cfg.dt_rank == 4

    tokens = [3, 11, 25, 7, 42]
    with torch.no_grad():
        want = hf_model(torch.tensor([tokens])).logits[0].float().numpy()
    got, _ = mamba_forward(rt.params, rt.cfg, np.asarray([tokens], np.int32))
    np.testing.assert_allclose(np.asarray(got[0]), want, rtol=2e-3, atol=2e-3)


def test_mamba_stateful_decode_matches_full(mamba_gguf):
    """Carrying (conv, ssm) state step-by-step == one full forward."""
    from prima_tpu.models.mamba import MambaRuntime, init_mamba_state, mamba_forward

    dst, _ = mamba_gguf
    rt = MambaRuntime.load(dst)
    toks = [3, 11, 25, 7, 42, 5]
    full, _ = mamba_forward(rt.params, rt.cfg, np.asarray([toks], np.int32))
    states = init_mamba_state(rt.cfg, 1)
    step_logits = []
    for t in toks:
        lg, states = mamba_forward(rt.params, rt.cfg,
                                   np.asarray([[t]], np.int32), states)
        step_logits.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(step_logits), np.asarray(full[0]),
                               rtol=1e-4, atol=1e-4)


def test_mamba_generate_matches_hf_greedy(mamba_gguf):
    from prima_tpu.models.mamba import MambaRuntime

    dst, hf_model = mamba_gguf
    rt = MambaRuntime.load(dst)
    prompt = [3, 11, 25]
    out = rt.generate(prompt, n_predict=8)
    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
            pad_token_id=0)
    assert out == hf_out[0, len(prompt):].tolist()


def test_mamba_cli(mamba_gguf, capsys):
    """llama-cli runs mamba models; so does prima-cli (recurrent path)."""
    import io
    import sys as _sys

    from prima_tpu.tools.cli import main as cli_main

    dst, _ = mamba_gguf
    old = _sys.stdout
    _sys.stdout = cap = io.StringIO()
    try:
        rc = cli_main(["-m", dst, "-p", "hello", "-n", "6", "--temp", "0",
                       "--no-display-prompt"])
    finally:
        _sys.stdout = old
    assert rc == 0 and len(cap.getvalue().strip()) > 0
