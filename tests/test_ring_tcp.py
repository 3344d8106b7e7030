"""Full multi-process distributed inference over the TCP ring — the
complete Docker-sim analogue: N processes, one GGUF, rank-filtered loading,
manual and solver-free windows, output identical to single-process."""

import multiprocessing as mp
import socket
import subprocess
import sys

import pytest

from prima_tpu.tools.make_tiny_gguf import make_tiny_gguf


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p + 50


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny4.gguf")
    return make_tiny_gguf(path, n_layers=4, seed=3)


def _run_rank(args):
    env = {"JAX_PLATFORMS": "cpu", "PRIMA_PALLAS_INTERPRET": "1",
           "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root"}
    return subprocess.Popen(
        [sys.executable, "-m", "prima_tpu.tools.cli"] + args,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        cwd="/root/repo", text=True,
    )


@pytest.mark.parametrize("windows,k", [("3,1", 1), ("1,1", 2)])
def test_two_process_ring_matches_single(tiny, windows, k):
    port = _free_port()
    common = ["-m", tiny, "-c", "64", "--matmul", "xla", "--data-port", str(port),
              "-w", "2", "-lw", windows, "-k", str(k)]
    p0 = _run_rank(common + ["--rank", "0", "-p", "Hello", "-n", "6",
                             "--temp", "0", "--no-display-prompt"])
    p1 = _run_rank(common + ["--rank", "1"])
    out0, err0 = p0.communicate(timeout=420)
    out1, err1 = p1.communicate(timeout=60)
    assert p0.returncode == 0, err0[-2000:]
    assert p1.returncode == 0, err1[-2000:]

    single = _run_rank(["-m", tiny, "-c", "64", "--matmul", "xla",
                        "-p", "Hello", "-n", "6", "--temp", "0",
                        "--no-display-prompt"])
    ref, err = single.communicate(timeout=420)
    assert single.returncode == 0, err[-2000:]
    assert out0.strip() == ref.strip()
    assert len(out0.strip()) > 0
