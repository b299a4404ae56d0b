"""The retired A/B compositions, kept as ONE reference definition.

Round 5 deleted the losing sequential arms from the product after their
final on-chip re-confirmation (TPU_TESTS.md round 5), but two consumers
still need the sequential min+max exact-final composition as a *reference*:
tests/test_warp_kernel_interpret.py pins dual-vs-sequential stats equality
bit-exactly in interpret mode, and tools/profile_stats_cost.py prices the
retired arm so C-vs-F stays a real A/B. A single shared definition keeps
the two from drifting apart (an edited copy would silently make the test
and the profiler measure different compositions).
"""

import jax.numpy as jnp


def sequential_dual(wg, packed_in, r, c, miss):
    """The retired sequential exact-final arm, built from the primitive
    masked gathers of ops/warp_gather: a min-anchored pass over the full
    miss set, then a max-anchored pass over the post-min residue.

    `wg` is the warp_gather module (passed in so interpret-mode monkeypatch
    wrappers of pl.pallas_call apply to the primitives it resolves)."""
    out_min, hit_min = wg.warp_gather_masked(packed_in, r, c, miss)
    out_max, hit_max = wg.warp_gather_masked_max(packed_in, r, c, miss & ~hit_min)
    return jnp.where(hit_min[None], out_min, out_max), hit_min | hit_max
