"""Evaluation modes of the perplexity tool (perplexity.cpp:766/1105/1406/
1686 analogues): hellaswag, winogrande, multiple-choice, KL-divergence,
each on tiny synthetic fixtures through a real tiny GGUF model."""

import math
import os
import struct

import numpy as np
import pytest

from prima_tpu.models.loader import load_model
from prima_tpu.tools.make_tiny_gguf import make_tiny_gguf
from prima_tpu.tools.perplexity import (_parse_winogrande_csv, _read_mc_tasks,
                                        compute_perplexity, hellaswag_score,
                                        kl_divergence, multiple_choice_score,
                                        winogrande_score)


@pytest.fixture(scope="module")
def lm(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    make_tiny_gguf(path, seed=3)
    return load_model(path)


DEVNULL = open(os.devnull, "w")


def test_hellaswag_runs(lm):
    tasks = []
    for i in range(4):
        tasks += [
            f"Activity {i}: someone is doing something",
            str(i % 4),
            "and then it continues one way",
            "and then it continues another way",
            "and then something else entirely happens",
            "and then it just ends",
        ]
    acc, n = hellaswag_score(lm, "\n".join(tasks), n_tasks=0, matmul="xla",
                             logfile=DEVNULL)
    assert n == 4
    assert 0.0 <= acc <= 100.0


def test_hellaswag_gold_detection(lm):
    """A task whose gold ending REPEATS the context verbatim should score
    higher than random endings for any LM-ish model — instead of asserting
    model quality, assert determinism and the 6-line parse."""
    lines = ["ctx: the cat sat", "1", "zzz qqq xxx", "on the mat",
             "zzz zzz zzz", "qqq qqq qqq"]
    acc1, _ = hellaswag_score(lm, "\n".join(lines), n_tasks=0, matmul="xla",
                              logfile=DEVNULL)
    acc2, _ = hellaswag_score(lm, "\n".join(lines), n_tasks=0, matmul="xla",
                              logfile=DEVNULL)
    assert acc1 == acc2  # deterministic


def test_winogrande_csv_parser():
    text = ('0,Sarah was a much better surgeon than Maria so _ always got '
            'the easier cases.,Sarah,Maria,2\n'
            '1,"The box, heavy as it was, fit in the _.",car,bag,1\n')
    tasks = _parse_winogrande_csv(text)
    assert len(tasks) == 2
    assert tasks[0]["choices"] == ["Sarah", "Maria"]
    assert tasks[0]["answer"] == 2
    assert tasks[0]["first"].endswith("so ")
    assert tasks[1]["first"] == "The box, heavy as it was, fit in the "
    assert tasks[1]["answer"] == 1


def test_winogrande_runs(lm):
    text = ('0,Alice gave Bob the book because _ was done reading.,'
            'Alice,Bob,1\n'
            '1,The cup fell off the table and _ broke.,the cup,the table,1\n')
    acc, n = winogrande_score(lm, text, matmul="xla", logfile=DEVNULL)
    assert n == 2
    assert 0.0 <= acc <= 100.0


def _mc_blob(tasks):
    """Serialize tasks into the reference's binary format."""
    def s(x: str) -> bytes:
        b = x.encode()
        return struct.pack("<I", len(b)) + b

    def answers(ans, labels):
        out = struct.pack("<I", len(ans))
        for a in ans:
            out += s(a)
        out += struct.pack(f"<{len(labels)}i", *labels)
        return out

    bodies = []
    for q, ans, labels in tasks:
        bodies.append(s(q) + answers(ans, labels) + answers(["x"], [0]))
    blob = struct.pack("<I", len(tasks))
    pos = 4 + 4 * len(tasks)
    for b in bodies:
        blob += struct.pack("<I", pos)
        pos += len(b)
    return blob + b"".join(bodies)


def test_mc_roundtrip_and_score(lm):
    blob = _mc_blob([
        ("What color is the sky?", ["blue", "green", "loud"], [1, 0, 0]),
        ("Two plus two is", ["four", "fish"], [1, 0]),
    ])
    parsed = _read_mc_tasks(blob)
    assert len(parsed) == 2
    assert parsed[0]["answers"] == ["blue", "green", "loud"]
    assert parsed[0]["labels"] == [1, 0, 0]
    acc, n = multiple_choice_score(lm, blob, matmul="xla", logfile=DEVNULL)
    assert n == 2
    assert 0.0 <= acc <= 100.0


def test_kl_divergence_self_is_zero(lm, tmp_path):
    """A model compared against its own saved logits must report ~0 KLD,
    ppl_ratio ~1 and 100% same-top — closing the codec round-trip."""
    text = "the quick brown fox jumps over the lazy dog. " * 30
    logits_file = str(tmp_path / "base.logits")
    ppl, _ = compute_perplexity(lm, text, n_ctx=64, matmul="xla",
                                max_chunks=2, logfile=DEVNULL,
                                logits_file=logits_file)
    assert math.isfinite(ppl)
    out = kl_divergence(lm, logits_file, matmul="xla", logfile=DEVNULL)
    # uint16 quantization of log-probs bounds the self-KLD near zero
    assert out["mean_kld"] < 1e-3
    assert abs(out["ppl_ratio"] - 1.0) < 1e-2
    assert out["same_top_p"] == 100.0
    assert out["count"] == 2 * (64 - 1 - 32)


def test_kl_divergence_detects_difference(lm, tmp_path):
    """Against a DIFFERENT model's logits the KLD must be clearly
    positive (here: same arch re-synthesized with another seed)."""
    text = "pack my box with five dozen liquor jugs. " * 30
    logits_file = str(tmp_path / "base.logits")
    compute_perplexity(lm, text, n_ctx=64, matmul="xla", max_chunks=1,
                       logfile=DEVNULL, logits_file=logits_file)
    path2 = str(tmp_path / "other.gguf")
    make_tiny_gguf(path2, seed=9)
    lm2 = load_model(path2)
    out = kl_divergence(lm2, logits_file, matmul="xla", logfile=DEVNULL)
    assert out["mean_kld"] > 0.01
