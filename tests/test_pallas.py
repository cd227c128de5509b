"""Fused Pallas step kernel — interpret mode on CPU (SURVEY.md §5: the
Pallas analog of the reference's fake-backend compile checks), correctness
vs the float64 golden across all compat flags."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gfx_ocean_tpu as ot
from gfx_ocean_tpu.config import CompatFlags
from gfx_ocean_tpu.golden.reference import golden_fields
from gfx_ocean_tpu.models.ocean import downsample_state
from gfx_ocean_tpu.ops.pallas_step import pallas_fields
from gfx_ocean_tpu.utils.complexpair import from_pair_np


@pytest.fixture(scope="module")
def state128():
    return downsample_state(ot.ocean_state_from_assets(), 128)


@pytest.mark.parametrize("flags", [
    CompatFlags(),
    CompatFlags(wrap_k=True),
    CompatFlags(ref_sign=False),
    CompatFlags(conj_neg=True),
])
def test_pallas_step_matches_golden(state128, flags):
    cfg = ot.OceanConfig(resolution=128, fft_impl="pallas",
                         matmul_precision="highest", compat=flags)
    disp = np.asarray(pallas_fields(state128.h0, state128.omega,
                                    jnp.float32(3.25), cfg, interpret=True))
    want = golden_fields(from_pair_np(np.asarray(state128.h0)),
                         np.asarray(state128.omega), 3.25, 1000.0, flags)
    err = np.abs(disp - want).max() / np.abs(want).max()
    assert err < 1e-5, f"{flags}: {err:.2e}"


def test_pallas_matches_jnp_path(state128):
    t = jnp.float32(7.5)
    cfg_p = ot.OceanConfig(resolution=128, fft_impl="pallas",
                           matmul_precision="highest", compute_normals=False)
    cfg_m = ot.OceanConfig(resolution=128, fft_impl="matmul",
                           matmul_precision="highest", compute_normals=False)
    a = np.asarray(pallas_fields(state128.h0, state128.omega, t, cfg_p,
                                 interpret=True))
    b = np.asarray(ot.make_step(cfg_m)(state128, t).displacement)
    assert np.abs(a - b).max() / np.abs(b).max() < 1e-6


def test_pallas_dot3_accuracy(state128):
    """bf16x3 ('high') must stay well inside the 1e-4 budget."""
    cfg = ot.OceanConfig(resolution=128, fft_impl="pallas", matmul_precision="high")
    disp = np.asarray(pallas_fields(state128.h0, state128.omega,
                                    jnp.float32(3.25), cfg, interpret=True))
    want = golden_fields(from_pair_np(np.asarray(state128.h0)),
                         np.asarray(state128.omega), 3.25, 1000.0, cfg.compat)
    err = np.abs(disp - want).max() / np.abs(want).max()
    assert err < 5e-5, f"dot3 error {err:.2e}"


@pytest.mark.slow
def test_pallas_fourstep_2048_matches_matmul():
    """N = 2048 routes through the four-step two-kernel pipeline (fused
    packed-Hermitian propagate + in-VMEM four-step stages); must agree
    with the jnp matmul path (which itself is golden-verified)."""
    rng = np.random.default_rng(11)
    n = 2048
    h0 = jnp.asarray(rng.standard_normal((2, n, n)).astype(np.float32) * 0.01)
    om = jnp.asarray((np.abs(rng.standard_normal((n, n))) + 0.1).astype(np.float32))
    st = ot.OceanState(h0=h0, omega=om)
    t = jnp.float32(5.5)
    cfg_p = ot.OceanConfig(resolution=n, fft_impl="pallas",
                           matmul_precision="highest", compute_normals=False)
    cfg_m = ot.OceanConfig(resolution=n, fft_impl="matmul",
                           matmul_precision="highest", compute_normals=False)
    a = np.asarray(pallas_fields(h0, om, t, cfg_p, interpret=True))
    b = np.asarray(ot.make_step(cfg_m)(st, t).displacement)
    rel = np.abs(a - b).max() / np.abs(b).max()
    assert rel < 1e-5, rel


def test_pallas_blocked_multiband_matches_golden():
    """256^2 at 'highest' routes through the row/col-blocked two-kernel
    pipeline with a 2-band grid; must match the golden like the single
    kernel does."""
    st = downsample_state(ot.ocean_state_from_assets(), 256)
    cfg = ot.OceanConfig(resolution=256, fft_impl="pallas",
                         matmul_precision="highest")
    disp = np.asarray(pallas_fields(st.h0, st.omega, jnp.float32(3.25), cfg,
                                    interpret=True))
    want = golden_fields(from_pair_np(np.asarray(st.h0)),
                         np.asarray(st.omega), 3.25, 1000.0, cfg.compat)
    err = np.abs(disp - want).max() / np.abs(want).max()
    assert err < 1e-5, f"blocked: {err:.2e}"


def test_pallas_fourstep_1024():
    """N=1024 routes through the four-step pipeline (n1=128 lane-pinned,
    n2=8 — measured 1.22x faster than the blocked kernel on v5e); against
    the jnp matmul path."""
    rng = np.random.default_rng(7)
    n = 1024
    h0 = jnp.asarray(rng.standard_normal((2, n, n)).astype(np.float32) * 0.01)
    om = jnp.asarray((np.abs(rng.standard_normal((n, n))) + 0.1).astype(np.float32))
    st = ot.OceanState(h0=h0, omega=om)
    cfg_p = ot.OceanConfig(resolution=n, fft_impl="pallas",
                           matmul_precision="highest", compute_normals=False)
    cfg_m = ot.OceanConfig(resolution=n, fft_impl="matmul", hermitian_pack=False,
                           matmul_precision="highest", compute_normals=False)
    a = np.asarray(pallas_fields(h0, om, jnp.float32(2.0), cfg_p, interpret=True))
    b = np.asarray(ot.make_step(cfg_m)(st, jnp.float32(2.0)).displacement)
    assert np.abs(a - b).max() / np.abs(b).max() < 1e-6


def test_pallas_fourstep_in_kernel_time_batch_bit_identical():
    """Round 5: the four-step row kernel's in-kernel time batch (tb > 1 —
    one band fetch serves tb frames) must be BIT-identical per frame to
    the tb=1 kernel: the per-frame dots have identical shapes and frames
    are independent (SURVEY §5)."""
    from gfx_ocean_tpu.ops.pallas_step import pallas_planes, pallas_planes_batch

    rng = np.random.default_rng(13)
    n = 1024
    h0 = jnp.asarray(rng.standard_normal((2, n, n)).astype(np.float32) * 0.01)
    om = jnp.asarray((np.abs(rng.standard_normal((n, n))) + 0.1).astype(np.float32))
    cfg = ot.OceanConfig(resolution=n, fft_impl="pallas",
                         matmul_precision="highest", compute_normals=False)
    ts = [1.5, 9.0]
    batch = np.asarray(pallas_planes_batch(h0, om, jnp.asarray(ts, jnp.float32),
                                           cfg, interpret=True))
    assert batch.shape == (2, 3, n, n)
    for j, t in enumerate(ts):
        single = np.asarray(pallas_planes(h0, om, jnp.float32(t), cfg,
                                          interpret=True))
        np.testing.assert_array_equal(batch[j], single)


def test_pallas_fourstep_fused_stage2_matches_split():
    """Round 5: at 4*n2 <= 128 the four-step kernels run their two
    stage-2 dots as ONE block-diagonal MXU pass (_fourstep_tables).
    Pin the measured-equality record: vs the split two-dot form, the
    row pass is exactly equal at every n2 and the col pass exactly
    equal at n2 = 16 (2048^2); n2 = 8 (1024^2) shows a 1-ulp height
    drift from backend reduction-tree re-pairing around the zero pad —
    bound it tightly so a real regression cannot hide under it."""
    from gfx_ocean_tpu.ops.pallas_step import (
        _cat_complex_np, _dft_matrix_np, _fourstep_col_call,
        _fourstep_permute_inputs, _fourstep_plan, _fourstep_row_call,
        _fourstep_tables)

    rng = np.random.default_rng(29)
    for n, col_exact in ((2048, True), (1024, False)):
        h0 = jnp.asarray(
            rng.standard_normal((2, n, n)).astype(np.float32) * 0.01)
        om = jnp.asarray(
            (np.abs(rng.standard_normal((n, n))) + 0.1).astype(np.float32))
        cfg = ot.OceanConfig(resolution=n, fft_impl="pallas",
                             matmul_precision="high", compute_normals=False)
        n1, n2, block, cblock = _fourstep_plan(n, cfg)
        row_f, col_f = _fourstep_tables(n, n1, n2, cfg.compat.ref_sign)
        assert row_f[1].shape == (4 * n2, 4 * n2)
        assert col_f[1].shape == (3 * n2, 4 * n2)
        w2cat = jnp.asarray(_cat_complex_np(*_dft_matrix_np(n2, 1)))
        row_u = (row_f[0], w2cat, row_f[2], row_f[3])
        col_u = (col_f[0], w2cat, col_f[2], col_f[3], col_f[4])
        pre, prq, omp, omq = _fourstep_permute_inputs(h0, om, cfg, n, n1, n2)
        t2 = jnp.asarray([[7.25, 0.0]], jnp.float32)
        y_f = _fourstep_row_call(t2, pre, prq, omp, omq, row_f, cfg,
                                 n, n1, n2, block, True)
        y_u = _fourstep_row_call(t2, pre, prq, omp, omq, row_u, cfg,
                                 n, n1, n2, block, True)
        np.testing.assert_array_equal(np.asarray(y_f), np.asarray(y_u))
        o_f = np.asarray(_fourstep_col_call(y_f, col_f, cfg, n, n1, n2,
                                            cblock, True))
        o_u = np.asarray(_fourstep_col_call(y_u, col_u, cfg, n, n1, n2,
                                            cblock, True))
        np.testing.assert_array_equal(o_f[0], o_u[0])   # disp_x exact
        np.testing.assert_array_equal(o_f[2], o_u[2])   # disp_z exact
        if col_exact:
            np.testing.assert_array_equal(o_f[1], o_u[1])
        else:
            drift = np.abs(o_f[1] - o_u[1]).max()
            assert drift < 4 * np.finfo(np.float32).eps * np.abs(
                o_u[1]).max(), drift


def test_pallas_rollout_time_batch_matches_single(state128, monkeypatch):
    """make_rollout(time_batch=2) on the pallas checksum path must agree
    with time_batch=1 (both route through the in-kernel forcing reduction
    of ops.pallas_step.pallas_checksums; agreement is reassociation-level,
    its docstring)."""
    import gfx_ocean_tpu.ops.pallas_step as ps

    orig_cks = ps.pallas_checksums
    monkeypatch.setattr(
        ps, "pallas_checksums",
        lambda h0, om, ts, cfg, interpret=False: orig_cks(h0, om, ts, cfg, True))
    cfg = ot.OceanConfig(resolution=128, fft_impl="pallas",
                         matmul_precision="highest", compute_normals=False)
    ts = jnp.arange(4, dtype=jnp.float32) * 0.7 + 1.0
    a = np.asarray(ot.make_rollout(cfg, keep_fields=False)(state128, ts))
    b = np.asarray(ot.make_rollout(cfg, keep_fields=False,
                                   time_batch=2)(state128, ts))
    np.testing.assert_allclose(a, b, rtol=2e-6)


def test_pallas_checksums_match_external(state128):
    """Round 5: the in-kernel forcing reduction (the packed <= 512 grid
    kernel's ``checksum`` output) must equal the external formula
    sum(planes) + sum(normals). The reference-state checksum nearly
    cancels (~-5 from ~1e4-magnitude summand groups), so the yardstick
    is the SUMMAND scale sum(|...|), not the cancelled total: a formula
    bug (wrong neighbor column, dropped band) shifts the value by
    ~N * O(1) contributions, reassociation noise measured ~2.5e-3."""
    from gfx_ocean_tpu.ops.derived import finite_difference_normals_planes
    from gfx_ocean_tpu.ops.pallas_step import pallas_checksums, pallas_planes

    ts = jnp.asarray([0.3, 1.7], jnp.float32)
    cfg_n = ot.OceanConfig(resolution=128, fft_impl="pallas")
    cfg_p = ot.OceanConfig(resolution=128, fft_impl="pallas",
                           compute_normals=False)
    assert cfg_n.hermitian_pack
    got_n = np.asarray(pallas_checksums(state128.h0, state128.omega, ts,
                                        cfg_n, interpret=True))
    got_p = np.asarray(pallas_checksums(state128.h0, state128.omega, ts,
                                        cfg_p, interpret=True))
    for j, t in enumerate(np.asarray(ts)):
        planes = pallas_planes(state128.h0, state128.omega, jnp.float32(t),
                               cfg_n, interpret=True)
        want_planes = float(jnp.sum(planes, dtype=jnp.float32))
        plane_scale = float(jnp.sum(jnp.abs(planes), dtype=jnp.float32))
        normals = finite_difference_normals_planes(
            planes[1], cfg_n.normal_height_scale)
        want_normals = float(jnp.sum(normals, dtype=jnp.float32))
        norm_scale = float(jnp.sum(jnp.abs(normals), dtype=jnp.float32))
        # plane-sum part (compute_normals=False kernel)
        assert abs(got_p[j] - want_planes) < 1e-5 * plane_scale
        # normals part, isolated by differencing the two kernel variants
        got_normals = got_n[j] - got_p[j]
        assert abs(got_normals - want_normals) < 1e-5 * norm_scale + 0.05


def test_pallas_checksums_unpacked_fallback(state128):
    """hermitian_pack=False at N <= 512 has no checksum kernel; the
    fallback reduces externally and must agree with the packed kernel's
    value to field accuracy (both sum the same fields — the 14- vs
    18-dot transforms differ at the ~1e-5 field level, so compare on
    the summand scale)."""
    from gfx_ocean_tpu.ops.pallas_step import pallas_checksums, pallas_planes

    ts = jnp.asarray([2.0], jnp.float32)
    cfg_p = ot.OceanConfig(resolution=128, fft_impl="pallas")
    cfg_u = ot.OceanConfig(resolution=128, fft_impl="pallas",
                           hermitian_pack=False)
    a = np.asarray(pallas_checksums(state128.h0, state128.omega, ts, cfg_p,
                                    interpret=True))
    b = np.asarray(pallas_checksums(state128.h0, state128.omega, ts, cfg_u,
                                    interpret=True))
    planes = pallas_planes(state128.h0, state128.omega, ts[0], cfg_p,
                           interpret=True)
    scale = float(jnp.sum(jnp.abs(planes), dtype=jnp.float32))
    assert abs(a[0] - b[0]) < 2e-4 * scale


@pytest.mark.slow
def test_pallas_checksums_fourstep_1024():
    """The four-step col kernel's in-kernel checksum (band partials +
    seam-deferred edge-column normals) vs the external formula, and the
    time-batched variant vs single frames (reassociation tolerance —
    the col kernel docstring)."""
    from gfx_ocean_tpu.ops.derived import finite_difference_normals_planes
    from gfx_ocean_tpu.ops.pallas_step import pallas_checksums, pallas_planes

    rng = np.random.default_rng(17)
    n = 1024
    h0 = jnp.asarray(rng.standard_normal((2, n, n)).astype(np.float32) * 0.01)
    om = jnp.asarray((np.abs(rng.standard_normal((n, n))) + 0.1).astype(np.float32))
    cfg = ot.OceanConfig(resolution=n, fft_impl="pallas")
    ts = jnp.asarray([0.3, 1.7], jnp.float32)
    batch = np.asarray(pallas_checksums(h0, om, ts, cfg, interpret=True))
    single = np.asarray(pallas_checksums(h0, om, ts[0:1], cfg, interpret=True))
    planes = pallas_planes(h0, om, ts[0], cfg, interpret=True)
    normals = finite_difference_normals_planes(planes[1],
                                               cfg.normal_height_scale)
    want = float(jnp.sum(planes, dtype=jnp.float32)
                 + jnp.sum(normals, dtype=jnp.float32))
    scale = float(jnp.sum(jnp.abs(planes), dtype=jnp.float32)
                  + jnp.sum(jnp.abs(normals), dtype=jnp.float32))
    assert abs(batch[0] - single[0]) < 1e-6 * scale
    assert abs(batch[0] - want) < 1e-5 * scale


def test_pallas_rejects_batched(state128):
    cfg = ot.OceanConfig(resolution=128, fft_impl="pallas")
    with pytest.raises(ValueError, match="unbatched"):
        pallas_fields(state128.h0[None], state128.omega[None],
                      jnp.float32(0.0), cfg, interpret=True)


def test_pallas_small_n_highest_is_finite_and_correct(state128):
    """Regression: n < 128 with 'highest' used to route to the blocked
    pipeline whose grid was (n // 128,) = (0,), silently returning
    uninitialized (NaN) memory. It now runs single-block."""
    st = downsample_state(state128, 64)
    cfg = ot.OceanConfig(resolution=64, fft_impl="pallas",
                         matmul_precision="highest", compute_normals=False)
    got = np.asarray(pallas_fields(st.h0, st.omega, jnp.float32(3.25), cfg,
                                   interpret=True))
    assert np.isfinite(got).all()
    want = golden_fields(from_pair_np(np.asarray(st.h0)),
                         np.asarray(st.omega), 3.25, cfg.domain_size,
                         cfg.compat)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-5, rel


def test_pallas_rejects_unknown_precision(state128):
    cfg = ot.OceanConfig(resolution=128, fft_impl="pallas",
                         matmul_precision="hihgest")  # typo must raise
    with pytest.raises(ValueError, match="unknown matmul precision"):
        pallas_fields(state128.h0, state128.omega, jnp.float32(0.0), cfg,
                      interpret=True)


def test_pallas_large_t_phase_matches_jnp_path(state128):
    """Regression: the in-kernel phase is Dekker-reduced like the jnp
    path; at t ~ 1000 s a plain f32 omega*t product would be ~3e-4 rad
    off and the two step implementations would diverge past the field
    budget."""
    st = downsample_state(state128, 64)
    t = jnp.float32(1000.25)
    cfg_p = ot.OceanConfig(resolution=64, fft_impl="pallas",
                           matmul_precision="highest", compute_normals=False)
    cfg_m = ot.OceanConfig(resolution=64, fft_impl="matmul",
                           matmul_precision="highest", compute_normals=False)
    a = np.asarray(pallas_fields(st.h0, st.omega, t, cfg_p, interpret=True))
    b = np.asarray(ot.make_step(cfg_m)(st, t).displacement)
    rel = np.abs(a - b).max() / np.abs(b).max()
    assert rel < 2e-6, rel


@pytest.mark.slow
def test_pallas_fourstep_compat_flags_match_matmul():
    """Every quirk flag reaches the four-step kernel (wrap_k in the
    in-kernel k-hat iotas, ref_sign in the column tables, conj_neg in the
    precompute planes): the all-flags-flipped config must still agree
    with the jnp matmul path at N = 2048."""
    rng = np.random.default_rng(13)
    n = 2048
    h0 = jnp.asarray(rng.standard_normal((2, n, n)).astype(np.float32) * 0.01)
    om = jnp.asarray((np.abs(rng.standard_normal((n, n))) + 0.1).astype(np.float32))
    st = ot.OceanState(h0=h0, omega=om)
    t = jnp.float32(3.25)
    flags = CompatFlags(wrap_k=True, ref_sign=False, conj_neg=True)
    cfg_p = ot.OceanConfig(resolution=n, fft_impl="pallas", compat=flags,
                           matmul_precision="highest", compute_normals=False)
    cfg_m = ot.OceanConfig(resolution=n, fft_impl="matmul", compat=flags,
                           matmul_precision="highest", compute_normals=False)
    a = np.asarray(pallas_fields(h0, om, t, cfg_p, interpret=True))
    b = np.asarray(ot.make_step(cfg_m)(st, t).displacement)
    rel = np.abs(a - b).max() / np.abs(b).max()
    assert rel < 1e-5, rel


def test_fourstep_plan_16384_guard():
    """Round 5: the four-step plan accepts N in [1024, 16384]; the
    unsharded 16384^2 entry warns (single-chip HBM capacity arithmetic
    in docs/DESIGN.md round 5) while a packing-disabled config stays
    silent, and out-of-range N still raises."""
    import warnings

    from gfx_ocean_tpu.ops.pallas_step import _fourstep_plan

    cfg = ot.OceanConfig(resolution=16384, fft_impl="pallas")
    with pytest.warns(UserWarning, match="row-sharded distributed"):
        n1, n2, block, cblock = _fourstep_plan(16384, cfg)
    assert (n1, n2) == (128, 128)
    assert 16384 % block == 0 and 16384 % cblock == 0

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _fourstep_plan(8192, cfg)  # largest single-chip grid: no warning

    with pytest.raises(ValueError, match=r"\[1024, 16384\]"):
        _fourstep_plan(32768, cfg)
