"""Two-process CPU init-broadcast test.

The reference is single-process (SURVEY.md §2.4); nf_tpu's multi-host
path must make every process start from identical parameters even though
data-dependent init (ActNorm) sees a different local batch per host —
Trainer.init_state broadcasts host-0's state (trainer.py:84-89).  This
test launches a real two-process jax.distributed group on CPU and checks
exactly that: per-process dd-init digests differ, post-init_state digests
match.
"""
import re
import socket
import subprocess
import sys
import os

import pytest

CHILD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "_distinit_child.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_init_broadcast():
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # children manage their own backend; drop the parent's 8-device flag so
    # each process gets a small clean CPU topology
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen([sys.executable, CHILD, addr, str(pid)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True, env=env)
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (out, err)
        outs.append(out)

    def grab(tag):
        vals = {}
        for out in outs:
            for m in re.finditer(rf"{tag} (\d) ([0-9.]+)", out):
                vals[int(m.group(1))] = float(m.group(2))
        assert set(vals) == {0, 1}, (tag, outs)
        return vals

    raw = grab("RAW")
    final = grab("FINAL")
    # dd-init on different local batches must differ ...
    assert abs(raw[0] - raw[1]) > 1e-6, raw
    # ... and init_state's broadcast must erase the difference
    assert abs(final[0] - final[1]) < 1e-9, final


@pytest.mark.slow
def test_launcher_forms_process_group():
    """Drive nf_tpu.parallel.launch itself (round-2 review: the launcher
    was never exercised): the env-configured two-process group must form
    inside the launcher, and a real init_state under it must produce
    identical params on both ranks."""
    addr = f"127.0.0.1:{_free_port()}"
    child = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "_launch_child.py")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COORDINATOR_ADDRESS"] = addr
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "nf_tpu.parallel.launch", child],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (out, err)
        outs.append(out)

    vals = {}
    for out in outs:
        for m in re.finditer(r"LAUNCHED (\d) ([0-9.]+)", out):
            vals[int(m.group(1))] = float(m.group(2))
    assert set(vals) == {0, 1}, outs
    assert vals[0] == vals[1], f"post-broadcast params differ: {vals}"
