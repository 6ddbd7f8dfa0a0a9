"""Native runtime: seqlock mailboxes, pacer, cross-process MPC service.

Mirrors the reference's tier-2 usage of the REAL async path
(scripts/test_mpc.py:41-67 polls newResult of a worker process)."""

import os
import time

import numpy as np
import pytest

from qrw_tpu.runtime.ipc import Mailbox, Pacer, load_library


def test_native_library_builds():
    lib = load_library()
    assert lib is not None


def test_mailbox_round_trip():
    box = Mailbox(f"/qrw_test_{os.getpid()}", (4, 3))
    try:
        assert box.read() is None               # nothing published yet
        a = np.arange(12.0).reshape(4, 3)
        box.write(a)
        got = box.read()
        np.testing.assert_array_equal(got, a)
        assert box.read() is None               # no new data
        box.write(a * 2)
        box.write(a * 3)                        # latest-value wins
        np.testing.assert_array_equal(box.read(), a * 3)
    finally:
        box.close()


def _xp_child(name):
    from qrw_tpu.runtime.ipc import Mailbox
    b = Mailbox(name, (8,), create=False)
    for i in range(5):
        b.write(np.full(8, float(i)))
        time.sleep(0.01)
    b.close()


def test_mailbox_cross_process():
    import multiprocessing as mp

    name = f"/qrw_xp_{os.getpid()}"
    box = Mailbox(name, (8,))
    child = _xp_child

    try:
        p = mp.get_context("spawn").Process(target=child, args=(name,))
        p.start()
        seen = []
        t0 = time.time()
        while time.time() - t0 < 10 and (not seen or seen[-1] != 4.0):
            got = box.read()
            if got is not None:
                seen.append(float(got[0]))
            time.sleep(0.001)
        p.join()
        assert seen and seen[-1] == 4.0
        assert seen == sorted(seen)             # monotone, no reordering
    finally:
        box.close()


def test_pacer_period():
    p = Pacer(0.002, spin_s=50e-6)              # the 500 Hz budget
    t0 = time.perf_counter()
    lates = [p.wait() for _ in range(50)]
    dt = time.perf_counter() - t0
    p.close()
    assert abs(dt - 0.1) < 0.02, dt             # ~50 periods of 2 ms
    assert np.median(lates) < 500e-6            # low jitter (not RT-tuned)


@pytest.mark.parametrize("type_mpc", [True])
def test_mpc_service_matches_direct_solve(type_mpc):
    """Worker-process MPC over native mailboxes returns the same plan as
    a direct in-process solve."""
    import jax
    import jax.numpy as jnp

    from qrw_tpu.config import Config
    from qrw_tpu.core import mpc as mpc_mod
    from qrw_tpu.runtime.mpc_service import MPCService
    from tests.test_mpc import _fsteps_fourstance, _xref

    cfg = Config(type_MPC=type_mpc)
    svc = MPCService(cfg)
    try:
        xref = _xref()
        fsteps = _fsteps_fourstance()
        svc.solve(0, xref, fsteps)
        got = svc.wait_result(timeout=120.0)
        ref = np.asarray(mpc_mod.solve_mpc(
            cfg, jnp.asarray(xref), jnp.asarray(fsteps),
            mpc_mod.init_mpc_state(cfg, jnp.float64)).x_f_applied)
        np.testing.assert_allclose(got, ref, atol=1e-9)
        # stale read path: no new data -> same plan returned
        np.testing.assert_array_equal(svc.get_latest_result(), got)
    finally:
        svc.stop()
