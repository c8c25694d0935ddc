"""Host-side semantics harness for the rdma kernel variant's halo
schedule (round-3 verdict item: the in-kernel remote-DMA path cannot
execute in this environment — the tunnel's AOT compiler rejects
collective Pallas kernels and jax 0.9 interpret modes cannot run remote
DMA under shard_map — so its deterministic schedule is verified here by
replaying `fused_kernel.rdma_schedule` in NumPy and asserting the
assembled stencil windows equal the ppermute path's, the variant that IS
bitwise-tested against the unsharded engine at 1/2/4/8 devices).

What the rdma variant changes versus the verified ppermute path is
exactly (a) WHICH rows move between devices and into which comm-buffer
slots, and (b) WHEN the sends/waits happen relative to the rotated block
order. Both are pure data-movement facts fully determined by the
schedule dict, so a host replay covers them completely; what it cannot
cover is Mosaic's lowering of make_async_remote_copy itself, which is
why the backend stays quarantined behind an explicit opt-in until
test_rdma_ring_on_tpu passes on real hardware.
"""

import numpy as np
import pytest

from latticeboltzmann_tpu.ops.fused_kernel import (
    RDMA_HR,
    pick_layout,
    rdma_schedule,
)

NSPEEDS = 9


def _remirror(x, ny, lpad):
    """Rebuild mirror-pad lanes from the real columns — the shared
    re-mirror semantics of parallel/sharded.py's _remirror (ppermute
    halos) and the kernel's fix_halo (rdma comm rows): lane j reads real
    column (j - lpad) mod ny."""
    nyp = x.shape[-1]
    lane_to_col = (np.arange(nyp) - lpad) % ny
    return x[..., lpad : lpad + ny][..., lane_to_col]


def _truth_windows(f, d, nb, br, T, ny, lpad):
    """The ppermute path's extended windows for device d: block b stages
    rows [b*br - T, b*br + br + T); cross-device rows come re-mirrored
    from the neighbors' edge rows (parallel/sharded.py one_pass: htop =
    _remirror(ppermute(src[:, L-T:, :])), hbot likewise)."""
    n_dev = len(f)
    L = f[d].shape[1]
    wins = []
    for b in range(nb):
        top = (
            _remirror(f[(d - 1) % n_dev][:, L - T :, :], ny, lpad)
            if b == 0
            else f[d][:, b * br - T : b * br, :]
        )
        body = f[d][:, b * br : b * br + br, :]
        bot = (
            _remirror(f[(d + 1) % n_dev][:, :T, :], ny, lpad)
            if b == nb - 1
            else f[d][:, (b + 1) * br : (b + 1) * br + T, :]
        )
        wins.append(np.concatenate([top, body, bot], axis=1))
    return wins


def _rdma_windows(f, d, nb, br, T, ny, lpad, sched):
    """Replay the rdma schedule for device d and return its assembled
    windows in body-block order, asserting the semaphore ordering as it
    goes: comm rows may only be read at/after their wait step."""
    n_dev = len(f)
    hr = sched["hr"]

    # grid step send_step on EVERY device: stage edge slabs from the
    # pass-input state (outputs go to the donated ping-pong buffer, so
    # no compute of this pass can have overwritten them), then remote-
    # copy: my last hr rows -> right neighbor's ct, my first hr rows ->
    # left neighbor's cb. The pass-start neighbor barrier guarantees the
    # previous pass finished consuming these comm buffers; the replay is
    # sequential per pass, so that ordering holds by construction.
    sbuf_down = [
        fd[:, sched["send_down_row0"] : sched["send_down_row0"] + hr, :] for fd in f
    ]
    sbuf_up = [fd[:, sched["send_up_row0"] : sched["send_up_row0"] + hr, :] for fd in f]
    ct = sbuf_down[(d - 1) % n_dev]  # left neighbor's rdma_down lands here
    cb = sbuf_up[(d + 1) % n_dev]  # right neighbor's rdma_up lands here

    th0, th1 = sched["top_halo_rows"]
    bh0, bh1 = sched["bot_halo_rows"]
    wins = {}
    for i in range(nb):
        b = (i + sched["body_offset"]) % nb
        # local wrapped staging (issue k stages block k mod nb): the
        # wrap is wrong only at the cross-device edges, where the comm
        # rows override it
        if b == 0:
            assert i >= sched["wait_down_step"], (
                f"block 0 at grid step {i} reads ct before its wait "
                f"(step {sched['wait_down_step']})"
            )
            top = _remirror(ct[:, th0:th1, :], ny, lpad)
        else:
            top = f[d][:, b * br - T : b * br, :]
        body = f[d][:, b * br : b * br + br, :]
        if b == nb - 1:
            assert i >= sched["wait_up_step"], (
                f"block {nb - 1} at grid step {i} reads cb before its "
                f"wait (step {sched['wait_up_step']})"
            )
            bot = _remirror(cb[:, bh0:bh1, :], ny, lpad)
        else:
            bot = f[d][:, ((b + 1) % nb) * br : ((b + 1) % nb) * br + T, :]
        wins[b] = np.concatenate([top, body, bot], axis=1)
    return [wins[b] for b in range(nb)]


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("temporal", [1, 3])
def test_rdma_window_assembly_matches_ppermute(n_dev, temporal):
    """For 2/4/8 devices the rdma schedule must assemble bit-identical
    stencil windows to the ppermute path (whose windows are themselves
    bitwise-tested against the unsharded engine in test_sharded.py)."""
    rng = np.random.default_rng(7 + n_dev + temporal)
    br, nb, ny = 8, 4, 256
    assert temporal <= RDMA_HR <= br
    L = nb * br
    nyp, lpad = pick_layout(ny, temporal)
    sched = rdma_schedule(nb, br, temporal)

    # raw stored state: real columns random, pad lanes decayed junk
    # (both paths must re-mirror arriving halo rows, never trust them)
    f = [rng.normal(size=(NSPEEDS, L, nyp)).astype(np.float32) for _ in range(n_dev)]

    for d in range(n_dev):
        truth = _truth_windows(f, d, nb, br, temporal, ny, lpad)
        got = _rdma_windows(f, d, nb, br, temporal, ny, lpad, sched)
        for b in range(nb):
            # compare real lanes exactly; pad lanes only where a path
            # re-mirrored (locally staged rows keep raw pads in BOTH
            # paths between refreshes, so compare those raw too)
            np.testing.assert_array_equal(
                got[b], truth[b], err_msg=f"device {d} block {b}"
            )


def test_rdma_schedule_overlap_structure():
    """The schedule must express the reference's overlap
    (MPI_Isend / compute-interior / MPI_Waitall / compute-boundary,
    README.md:45-51): sends at the first grid step, both waits within
    the last two steps, and the two consuming edge blocks in the last
    two body slots."""
    for nb in (3, 4, 25):
        s = rdma_schedule(nb, 32, 3)
        assert s["send_step"] == 0
        assert s["wait_up_step"] >= nb - 2 or nb <= 2
        assert s["wait_down_step"] == nb - 1
        order = [(i + s["body_offset"]) % nb for i in range(nb)]
        # edge blocks (halo consumers) land on the last two grid steps
        assert set(order[-2:]) == {0, nb - 1}
        # interior blocks all run before either wait
        interior_steps = [i for i, b in enumerate(order) if b not in (0, nb - 1)]
        assert all(i < min(s["wait_up_step"], s["wait_down_step"])
                   for i in interior_steps)


def test_rdma_send_rows_are_the_halo_rows():
    """The hr-row slabs must contain exactly the rows the consumer
    reads: ct rows [hr-T, hr) are the sender's last T rows; cb rows
    [0, T) its first T rows."""
    nb, br, T = 4, 8, 3
    s = rdma_schedule(nb, br, T)
    L = nb * br
    th0, th1 = s["top_halo_rows"]
    bh0, bh1 = s["bot_halo_rows"]
    # sender-local row indices covered by each consumed slice
    down_rows = range(s["send_down_row0"] + th0, s["send_down_row0"] + th1)
    up_rows = range(s["send_up_row0"] + bh0, s["send_up_row0"] + bh1)
    assert list(down_rows) == list(range(L - T, L))
    assert list(up_rows) == list(range(T))
