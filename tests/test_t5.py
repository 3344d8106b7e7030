"""T5 encoder-decoder: HF conversion + parity + seq2seq generation."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from test_convert_hf import _write_tokenizer_json  # noqa: E402

pytestmark = pytest.mark.slow  # arch-zoo/e2e tier (ci/run.sh runs it)


def _mk(tmp_path_factory, gated):
    d = str(tmp_path_factory.mktemp("t5g" if gated else "t5"))
    cfg = transformers.T5Config(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=128, dropout_rate=0.0,
        feed_forward_proj="gated-gelu" if gated else "relu",
        decoder_start_token_id=0, eos_token_id=1, pad_token_id=0,
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    model = transformers.T5ForConditionalGeneration(cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=True)
    _write_tokenizer_json(d, cfg.vocab_size)

    from prima_tpu.tools.convert_hf import convert_hf_to_gguf

    dst = os.path.join(d, "t5.gguf")
    n = convert_hf_to_gguf(d, dst, "F32", logfile=open(os.devnull, "w"))
    assert n > 0
    return dst, model


@pytest.fixture(scope="module")
def t5_gguf(tmp_path_factory):
    return _mk(tmp_path_factory, gated=False)


@pytest.fixture(scope="module")
def t5_gated_gguf(tmp_path_factory):
    return _mk(tmp_path_factory, gated=True)


def _parity(dst, hf_model):
    from prima_tpu.models.t5 import T5Runtime, t5_decode, t5_encode

    rt = T5Runtime.load(dst)
    inp = [3, 11, 25, 7]
    dec = [0, 5, 9]
    enc = t5_encode(rt.params, rt.cfg, np.asarray([inp], np.int32))
    with torch.no_grad():
        hf_enc = hf_model.encoder(torch.tensor([inp])).last_hidden_state
        want = hf_model(input_ids=torch.tensor([inp]),
                        decoder_input_ids=torch.tensor([dec])).logits
    np.testing.assert_allclose(np.asarray(enc[0]), hf_enc[0].numpy(),
                               rtol=2e-3, atol=2e-3)
    got = t5_decode(rt.params, rt.cfg, np.asarray([dec], np.int32), enc)
    np.testing.assert_allclose(np.asarray(got[0]), want[0].numpy(),
                               rtol=2e-3, atol=2e-3)
    return rt


def test_t5_relu_parity(t5_gguf):
    rt = _parity(*t5_gguf)
    assert not rt.cfg.ffn_gated and rt.cfg.tie_embeddings


def test_t5_gated_parity(t5_gated_gguf):
    rt = _parity(*t5_gated_gguf)
    assert rt.cfg.ffn_gated


def test_t5_generate_matches_hf(t5_gguf):
    from prima_tpu.models.t5 import T5Runtime

    dst, hf_model = t5_gguf
    rt = T5Runtime.load(dst)
    inp = [3, 11, 25, 7, 2]
    out = rt.generate(inp, n_predict=8)
    with torch.no_grad():
        hf_out = hf_model.generate(torch.tensor([inp]), max_new_tokens=8,
                                   do_sample=False)
    # HF output starts with decoder_start_token
    want = hf_out[0, 1:].tolist()
    assert out[: len(want)] == want
