"""Checkpoint portability: state written from the SCALED (TPU) device
representation must reload bit-comparably into both scaled and classic
configurations — checkpoints always store classic f64 limbs (unlike the
reference's layout-locked rank-local dumps, save_checkpoint.cxx:11-35)."""
import numpy as np

import jax.numpy as jnp


def test_scaled_state_checkpoint_roundtrip(tmp_path):
    import mpmath

    from sdpb_tpu.io.sdp_zip import read_sdp
    from sdpb_tpu.models.sdp import build_device_sdp
    from sdpb_tpu.ops import mpfloat as mp
    from sdpb_tpu.solver.checkpoint import load_checkpoint, save_checkpoint
    from sdpb_tpu.solver.state import initial_state
    from sdpb_tpu.utils.strings import (scaled_limbs_to_mpf,
                                        str_to_scaled_limbs)

    K32 = 5
    K64 = -(-(24 * K32) // 53) + 1
    host = read_sdp("/root/reference/test/data/sdp.zip", K64, np.float64)
    sdp = build_device_sdp(host, scaled_limbs=K32)
    omega = str_to_scaled_limbs("1.37e11", K32)   # full-mantissa, off-ladder
    state = initial_state(sdp, omega, omega)

    gen = save_checkpoint(tmp_path, sdp, state, verbosity=0)
    assert gen == 0

    # reload into the SAME scaled config: values identical to full precision
    re_scaled = load_checkpoint(tmp_path, sdp, verbosity=0)
    for a, b in ((state.buckets[0].X_even, re_scaled.buckets[0].X_even),
                 (state.y, re_scaled.y)):
        va = np.asarray(mp.to_double(a))
        vb = np.asarray(mp.to_double(b))
        assert np.array_equal(va, vb)
    # exact at the limb level too: X diag entries round-trip through f64
    la = np.asarray(state.buckets[0].X_even.limbs)
    lb = np.asarray(re_scaled.buckets[0].X_even.limbs)
    ea = np.asarray(state.buckets[0].X_even.exp)
    eb = np.asarray(re_scaled.buckets[0].X_even.exp)
    with mpmath.workprec(24 * K32 + 64):
        i = 0  # first diag element
        got_a = scaled_limbs_to_mpf(la[:, 0, i, i], ea[0, i, i])
        got_b = scaled_limbs_to_mpf(lb[:, 0, i, i], eb[0, i, i])
        assert got_a == got_b

    # reload into a CLASSIC f64 config of the same problem: same values
    host64 = read_sdp("/root/reference/test/data/sdp.zip", 3, np.float64)
    sdp64 = build_device_sdp(host64)
    re_classic = load_checkpoint(tmp_path, sdp64, verbosity=0)
    assert not re_classic.y.scaled
    va = np.asarray(mp.to_double(state.buckets[0].X_even))
    vb = np.asarray(mp.to_double(re_classic.buckets[0].X_even))
    assert np.allclose(va, vb, rtol=0, atol=0)
