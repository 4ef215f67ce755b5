import numpy as np
import jax.numpy as jnp

from world_tpu.ops import common, fftpack, matlab, rng


def test_rfft_convention(gold):
    x = np.sin(np.arange(64) * 0.3) + 0.02 * np.arange(64)
    sp = np.asarray(fftpack.rfft(jnp.asarray(x)))
    np.testing.assert_allclose(sp.real, gold["rfft64_re"], atol=1e-12)
    np.testing.assert_allclose(sp.imag, gold["rfft64_im"], atol=1e-12)


def test_irfft_convention(gold):
    i = np.arange(33)
    spec = np.cos(i * 0.2) + 1j * (np.sin(i * 0.41) * 0.5)
    out = np.asarray(fftpack.irfft_unnormalized(jnp.asarray(spec), 64))
    np.testing.assert_allclose(out, gold["irfft64_out"], atol=1e-12)


def test_fast_fftfilt(gold):
    # Golden dumped from fast_fftfilt (src/matlabfunctions.cpp:266-301)
    # with x=sin(0.37 i)+0.25 cos(1.1 i^2) (19), h=1/(1+i^2) (7), n=32.
    i = np.arange(19)
    x = np.sin(0.37 * i) + 0.25 * np.cos(1.1 * i * i)
    h = 1.0 / (1.0 + np.arange(7.0) ** 2)
    out = np.asarray(matlab.fast_fftfilt(jnp.asarray(x), jnp.asarray(h), 32))
    np.testing.assert_allclose(out, gold["fast_fftfilt"], atol=1e-15)


def test_nuttall(gold):
    np.testing.assert_allclose(
        np.asarray(common.nuttall_window(64)), gold["nuttall_64"], atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(common.nuttall_window(257)), gold["nuttall_257"],
        atol=1e-13)


def test_interp1(gold):
    n = 10
    xs = np.arange(n, dtype=float)
    ys = np.sin(np.arange(n) * 0.7) + 0.1 * np.arange(n)
    xi = -1.0 + np.arange(200) * (11.5 / 199)
    out = np.asarray(matlab.interp1(jnp.asarray(xs), jnp.asarray(ys),
                                    jnp.asarray(xi)))
    np.testing.assert_allclose(out, gold["interp1_out"], atol=1e-12)


def test_interp1q(gold):
    ys = np.sin(np.arange(10) * 0.7) + 0.1 * np.arange(10)
    xi = np.arange(200) * (4.99 / 199)
    out = np.asarray(matlab.interp1q(0.0, 0.5, jnp.asarray(ys),
                                     jnp.asarray(xi)))
    np.testing.assert_allclose(out, gold["interp1Q_out"], atol=1e-12)


def test_decimate(gold):
    x = gold["x"][:2000]
    for r in range(2, 13):
        out = np.asarray(matlab.decimate(jnp.asarray(x), r))
        ref = gold[f"decimate_r{r}"]
        np.testing.assert_allclose(out, ref, atol=1e-12, err_msg=f"r={r}")


def test_dc_correction(gold):
    fs = gold.scalar("fs")
    spec = gold["spec_in"]
    out = np.asarray(common.dc_correction(jnp.asarray(spec), jnp.asarray(160.0),
                                          fs, 1024))
    np.testing.assert_allclose(out, gold["dccorr_out"], rtol=1e-12)


def test_linear_smoothing(gold):
    fs = gold.scalar("fs")
    spec = gold["spec_in"]
    width = 160.0 * 2.0 / 3.0
    b_max = int(width * 1024 / fs) + 1 + 7  # deliberately larger than C++
    out = np.asarray(common.linear_smoothing(
        jnp.asarray(spec), jnp.asarray(width), fs, 1024, b_max))
    np.testing.assert_allclose(out, gold["linsmooth_out"], rtol=1e-10)


def test_minimum_phase(gold):
    logspec = gold["minphase_logspec_in"]
    mp = np.asarray(common.minimum_phase_spectrum(jnp.asarray(logspec), 512))
    np.testing.assert_allclose(mp.real, gold["minphase_re"], atol=1e-12)
    np.testing.assert_allclose(mp.imag, gold["minphase_im"], atol=1e-12)


def test_randn_sequence(gold):
    draws = np.asarray(rng.randn_sequence(1024))
    np.testing.assert_allclose(draws, gold["randn_1024"], atol=0)


def test_randn_jump_matches_sequence(gold):
    # Jump straight to draw 1000 and check the next 24 draws line up.
    draws = np.asarray(rng.randn_blocks_at(jnp.asarray([0, 1000]), 24))
    ref = gold["randn_1024"]
    np.testing.assert_allclose(draws[0], ref[:24], atol=0)
    np.testing.assert_allclose(draws[1], ref[1000:1024], atol=0)


def test_lti_block_filter_matches_scan():
    """lti_block_filter == the per-sample recurrence for both LTI systems
    we run in block form (decimate's 3rd-order DFII stage and the
    contour-smoothing biquad), at awkward lengths spanning block edges."""
    rs = np.random.default_rng(7)

    def run_scan(M, e, c, d, x):
        s = np.zeros(M.shape[0])
        y = np.empty_like(x)
        for t in range(len(x)):
            y[t] = d * x[t] + c @ s
            s = M @ s + e * x[t]
        return y

    from world_tpu.models.harvest_contour import _biquad_tables, _B, _A
    from world_tpu.ops.matlab import lti_block_filter, lti_block_tables

    M = np.array([[_A[0], _A[1], _B[1], _B[0]],
                  [1.0, 0.0, 0.0, 0.0],
                  [0.0, 0.0, 0.0, 0.0],
                  [0.0, 0.0, 1.0, 0.0]])
    e = np.array([_B[0], 0.0, 1.0, 0.0])
    c = np.array([_A[0], _A[1], _B[1], _B[0]])
    for n in (1, 127, 128, 129, 1000):
        x = rs.standard_normal(n)
        want = run_scan(M, e, c, _B[0], x)
        got = np.asarray(lti_block_filter(
            jnp.asarray(x), _biquad_tables(), jnp.float64))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)

    # 2D lanes: each lane filtered independently.
    x2 = rs.standard_normal((300, 5))
    tables = lti_block_tables(M, e, c, _B[0], 128)
    got2 = np.asarray(lti_block_filter(jnp.asarray(x2), tables, jnp.float64))
    for k in range(5):
        np.testing.assert_allclose(
            got2[:, k], run_scan(M, e, c, _B[0], x2[:, k]),
            rtol=1e-12, atol=1e-14)


def test_window_slice_table_matches_vmap():
    """window_slice_table == vmap(window_slice) bit-for-bit, including
    edge-clamped reads that start before 0 / run past the end, for every
    start % 8 residue and several window widths."""
    import jax

    rs = np.random.default_rng(11)
    x = jnp.asarray(rs.standard_normal(1000))
    for max_len in (1, 7, 64, 150, 389):
        starts = jnp.asarray(np.concatenate([
            np.arange(-max_len - 4, 20),            # left edge, all residues
            rs.integers(0, 1000, 40),               # interior
            np.arange(1000 - max_len - 4, 1004),    # right edge
        ]).astype(np.int32))
        want = np.asarray(jax.vmap(
            lambda s: common.window_slice(x, s, max_len))(starts))
        got = np.asarray(common.window_slice_table(x, starts, max_len))
        np.testing.assert_array_equal(got, want)


def test_window_slice_table_tiled_wide_windows():
    """Windows wider than the 1024-sample slab tile read multiple
    row-gathers; must stay bit-identical to vmap(window_slice)
    (d4c at 48 kHz uses max_len 4096)."""
    import jax

    rs = np.random.default_rng(13)
    x = jnp.asarray(rs.standard_normal(9000))
    for max_len in (1024, 1500, 2048, 4096):
        starts = jnp.asarray(np.concatenate([
            np.arange(-max_len - 4, 12),
            rs.integers(0, 9000, 24),
            np.arange(9000 - max_len - 4, 9004),
        ]).astype(np.int32))
        want = np.asarray(jax.vmap(
            lambda s: common.window_slice(x, s, max_len))(starts))
        got = np.asarray(common.window_slice_table(x, starts, max_len))
        np.testing.assert_array_equal(got, want)


def test_block_summaries_hierarchical_matches_flat():
    """Wide frame blocks (B > 24, dio's 5 ms frames at the raw rate)
    reduce 8-slot sub-blocks then merge; the merged last-3/first-4/
    count summaries must be bit-identical to the flat unrolled
    extraction (same crossings, same precedence)."""
    from world_tpu.ops import zerocross

    rs = np.random.default_rng(17)
    for L, fp in ((5000, 111), (2600, 40), (2000, 25)):
        x = jnp.asarray(np.cumsum(rs.standard_normal(L)) * 0.1
                        + np.sin(np.arange(L) * 0.05))
        frames = np.arange(0, L, fp)
        bi, bm = zerocross.frame_block_layout(frames, L)
        B = bi.shape[1]
        assert B > 24  # hierarchical path
        sums, n_pairs = zerocross.four_stream_block_summaries(
            x, L, bi, bm)
        # flat reference (the B <= 24 branch's exact algorithm)
        big = 1e300
        d = jnp.roll(x, -1) - x
        streams = jnp.stack([x, -x, d, -d])
        valids = np.array([L, L, L - 1, L - 1])
        idx = jnp.arange(L)
        s_next = jnp.roll(streams, -1, axis=-1)
        is_edge = (streams > 0.0) & (s_next <= 0.0) \
            & (idx[None, :] < jnp.asarray(valids)[:, None] - 1)
        fine = (idx + 1).astype(x.dtype) - streams / (s_next - streams)
        F = bi.shape[0]
        blk_f = fine[:, bi.reshape(-1)].reshape(4, F, B)
        blk_e = is_edge[:, bi.reshape(-1)].reshape(4, F, B) \
            & jnp.asarray(bm)
        l1 = l2 = l3 = jnp.full((4, F), -big)
        for o in range(B):
            v, e = blk_f[..., o], blk_e[..., o]
            l1, l2, l3 = (jnp.where(e, v, l1), jnp.where(e, l1, l2),
                          jnp.where(e, l2, l3))
        f1 = f2 = f3 = f4 = jnp.full((4, F), big)
        for o in range(B - 1, -1, -1):
            v, e = blk_f[..., o], blk_e[..., o]
            f1, f2, f3, f4 = (jnp.where(e, v, f1), jnp.where(e, f1, f2),
                              jnp.where(e, f2, f3), jnp.where(e, f3, f4))
        cnt = jnp.sum(blk_e, axis=-1).astype(x.dtype)
        want = jnp.stack([l1, l2, l3, f1, f2, f3, f4, cnt,
                          blk_f[..., 0], blk_e[..., 0].astype(x.dtype)])
        np.testing.assert_array_equal(np.asarray(sums), np.asarray(want))
