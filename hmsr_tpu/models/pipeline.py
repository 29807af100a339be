"""The end-to-end burst pipeline (Alg. 1), jitted as ONE XLA program.

Rebuild of reference super_resolution.py:41-200 (``main``). Where the
reference runs a Python loop over frames with per-stage kernel launches,
Torch<->Numba handoffs, and hand-placed ``cuda.synchronize()`` barriers, this
pipeline is a single traced program:

- reference-frame precomputations (grey, pyramid, tiles, gradients, Hessians,
  local stats) happen once and live in HBM;
- the burst is scanned with ``lax.scan`` (memory-light, like the reference's
  streaming buffer) over HBM-resident frames, each step running
  align -> robustness -> kernels -> merge fully fused;
- the num/den accumulators ride the scan carry; division happens once at the
  end.

One runtime, one array type — the reference's entire synchronization story
(SURVEY.md section 1) vanishes by construction.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.accumfix import REFILL_BORDER, normalize_accum
from ..ops.grey import compute_grey_image
from ..utils.types import DEFAULT_FLOAT
from .alignment import align, init_alignment
from .kernels import estimate_kernels
from .merge import merge, merge_ref
from .merge_tiled import merge_tiled, merge_ref_tiled
from .merge_fused import merge_burst_tiled
from .merge_slab import merge_burst_slab
from .robustness import compute_robustness, init_robustness


def _on_tpu():
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _use_tiled(config):
    impl = config.get("tpu", {}).get("merge_impl", "auto")
    integer_scale = float(config.scale) == int(config.scale)
    if impl == "gather" or (impl == "auto" and not integer_scale):
        return False
    if not integer_scale:
        raise ValueError("tiled merge requires an integer scale")
    return True


def select_merge(config):
    """Pick the merge implementation: the fused Pallas kernel on TPU, the
    tiled XLA fast path elsewhere (integer scales), and the exact
    reference-layout gather path for fractional scales."""
    impl = config.get("tpu", {}).get("merge_impl", "auto")
    if impl == "pallas" or (impl == "auto" and _use_tiled(config) and _on_tpu()):
        from ..ops.pallas_merge import merge_pallas
        if bool(config.get("tpu", {}).get("pallas_interpret", False)):
            def _merge_pallas_interp(*a, **k):
                return merge_pallas(*a, interpret=True, **k)
            # run_pipeline keys the padded accumulator geometry off the name
            _merge_pallas_interp.__name__ = "merge_pallas"
            return _merge_pallas_interp
        return merge_pallas
    return merge_tiled if _use_tiled(config) else merge


def select_merge_ref(config):
    """Reference-frame merge implementation (see :func:`select_merge`)."""
    if _use_tiled(config):
        return merge_ref_tiled
    return merge_ref_banded


def merge_ref_banded(ref_img, covs, num, den, cfa_pattern, config,
                     acc_rob=None, band_rows=512):
    """Reference-frame merge evaluated in HR row bands (bounded temporaries).

    Mathematically identical to :func:`merge_ref`; the banding only bounds the
    size of the materialized gather intermediates at 48MP outputs.
    """
    n_ch, out_h, out_w = num.shape
    band_rows = min(band_rows, out_h)
    n_bands = -(-out_h // band_rows)
    pad_h = n_bands * band_rows

    def one_band(start):
        nb = jax.lax.dynamic_slice_in_dim(num_p, start, band_rows, 1)
        db = jax.lax.dynamic_slice_in_dim(den_p, start, band_rows, 1)
        return merge_ref(ref_img, covs, nb, db, cfa_pattern, config,
                         acc_rob=acc_rob, row_offset=start)

    num_p = jnp.pad(num, ((0, 0), (0, pad_h - out_h), (0, 0)))
    den_p = jnp.pad(den, ((0, 0), (0, pad_h - out_h), (0, 0)))
    starts = jnp.arange(n_bands, dtype=jnp.int32) * band_rows
    nb, db = jax.lax.map(one_band, starts)      # (nb, c, band, W)
    nb = jnp.transpose(nb, (1, 0, 2, 3)).reshape(n_ch, pad_h, out_w)[:, :out_h]
    db = jnp.transpose(db, (1, 0, 2, 3)).reshape(n_ch, pad_h, out_w)[:, :out_h]
    return nb, db


def _merge_burst_chunked(comp_imgs, flows, covs_stack, rmaps, num, den,
                         cfa_pattern, config):
    """Accumulate the burst through the burst-fused Pallas merge in frame
    chunks of ``tpu.merge_chunk`` (default 5).

    Each chunk is ONE pallas_call with a (rows, groups, frames) grid —
    num/den visit HBM once per chunk instead of once per frame (the scan
    formulation moves ~45 GB of accumulator traffic at 20x12MP/x2; chunks
    of 5 cut that to ~9 GB while bounding the precomputed parameter-plane
    footprint to chunk size). The burst is padded to a chunk multiple with
    zero-robustness frames (exactly zero contribution; covariances repeat
    the last real frame so the bilinear interpolation stays finite).
    """
    from ..ops.pallas_merge import merge_burst_pallas
    interpret = bool(config.get("tpu", {}).get("pallas_interpret", False))
    f0 = comp_imgs.shape[0]
    fc = int(config.get("tpu", {}).get("merge_chunk", 5))
    fc = max(1, min(fc, f0))
    n_chunks = -(-f0 // fc)
    fpad = n_chunks * fc - f0
    if fpad:
        zpad = lambda a: jnp.concatenate(
            [a, jnp.zeros((fpad,) + a.shape[1:], a.dtype)])
        comp_imgs = zpad(comp_imgs)
        flows = zpad(flows)
        rmaps = zpad(rmaps)
        covs_stack = jnp.concatenate(
            [covs_stack, jnp.repeat(covs_stack[-1:], fpad, axis=0)])

    def chunk_step(carry, xs):
        num, den = carry
        c, f, k, r = xs
        num, den = merge_burst_pallas(c, f, k, r, num, den, cfa_pattern,
                                      config, interpret=interpret)
        return (num, den), None

    resh = lambda a: a.reshape((n_chunks, fc) + a.shape[1:])
    (num, den), _ = jax.lax.scan(
        chunk_step, (num, den),
        (resh(comp_imgs), resh(flows), resh(covs_stack), resh(rmaps)))
    return num, den


def flow_to_raw_grid(flow, raw_shape, tile_size):
    """Re-tile a decimating-grey flow onto the raw-image tile grid.

    With ``grey_method="decimating"`` alignment runs on the half-resolution
    grey image: its tiles of ``tile_size`` grey pixels cover ``2*tile_size``
    raw pixels and its flow values are in grey-pixel units. Downstream
    consumers (merge.py:104-105, robustness.py:91-92 of this repo, mirroring
    reference merge.py:322-325 / robustness.py:375-384) index tiles and apply
    flow on the RAW grid — the reference's own decimating path hands them the
    half-resolution flow unconverted, which mis-scales the warp; we convert:
    values x2 (grey px -> raw px) and each grey tile repeated 2x2 so raw tile
    ``(i, j)`` reads grey tile ``(i // 2, j // 2)``. Edge-padded/cropped to
    the raw tile count (documented deviation, README "Parity notes").
    """
    ny = -(-raw_shape[0] // tile_size)
    nx = -(-raw_shape[1] // tile_size)
    f = jnp.repeat(jnp.repeat(flow * 2.0, 2, axis=0), 2, axis=1)
    pad_y = max(0, ny - f.shape[0])
    pad_x = max(0, nx - f.shape[1])
    if pad_y or pad_x:
        f = jnp.pad(f, ((0, pad_y), (0, pad_x), (0, 0)), mode="edge")
    return f[:ny, :nx]


def run_pipeline(ref_img, comp_imgs, std_curve, diff_curve, config,
                 cfa_pattern, white_balance, grey_consts=None):
    """Traceable pipeline body. All config/cfa/wb are trace-time constants.

    Returns ``(image, debug)`` where ``image`` is (H*s, W*s, c) num/den and
    ``debug`` holds optional per-frame flows/robustness and the accumulated
    robustness mask.

    ``grey_consts``: optional :func:`hmsr_tpu.ops.grey.grey_matmul_consts`
    pair passed as ARGUMENTS through the caller's jit boundary; None falls
    back to the in-trace circulant expansion (bit-identical, ~54 ms/call).
    """
    bayer = config.mode == "bayer"
    scale = config.scale
    debug_mode = bool(config.debug)
    accumulate_r = bool(config.accumulated_robustness_denoiser.get("enabled", False)
                        or config.robustness.save_mask)
    robustness_denoise = bool(config.accumulated_robustness_denoiser.get("enabled", False))

    ref_img = ref_img.astype(DEFAULT_FLOAT)
    comp_imgs = comp_imgs.astype(DEFAULT_FLOAT)

    grey_method = str(config.get("grey_method", "FFT"))
    grey_impl = str(config.get("tpu", {}).get("grey_impl", "auto"))
    decimating = bayer and grey_method == "decimating"
    ts_raw = int(config.block_matching.tuning.tile_size)

    def to_grey(frame):
        return compute_grey_image(frame, grey_method, impl=grey_impl,
                                  consts=grey_consts) \
            if bayer else frame

    def to_raw_flow(flow, raw_shape):
        return flow_to_raw_grid(flow, raw_shape, ts_raw) if decimating else flow

    # ---- reference init (amortized across the whole burst)
    ref_grey = to_grey(ref_img)
    align_state = init_alignment(ref_grey, config)
    ref_stats = init_robustness(ref_img, cfa_pattern, white_balance,
                                (std_curve, diff_curve), config)

    h, w = ref_img.shape
    out_h, out_w = round(scale * h), round(scale * w)
    n_ch = 3 if bayer else 1

    pipe_mode = config.get("tpu", {}).get("pipeline", "auto")
    if pipe_mode == "auto":
        # on TPU the scan pipeline + Pallas merge kernel is fastest; the
        # burst-fused "chunked" grid measured slightly SLOWER end-to-end
        # (2.49 s vs 2.30 s at 20x12MP/x2 — accumulator HBM round trips are
        # only ~55 ms total at v5e bandwidth, and the analyze phase pays to
        # materialize per-frame robustness/covariance stacks); the "vmapped"
        # frames-batched analysis also measured SLOWER (1.850 s vs 1.763 s
        # at 20x12MP/Ts=16, tools/ab_pipeline_r5.log — program count is
        # unchanged, so the per-program fixed cost it was meant to amortize
        # stays, while the stacked analysis products add HBM traffic); the
        # fused-slab path is best for XLA-only backends
        pipe_mode = "scan" if _on_tpu() else "fused"
    fused = pipe_mode == "fused" and _use_tiled(config)
    chunked = pipe_mode == "chunked" and _use_tiled(config)
    if pipe_mode == "chunked" and not chunked:
        raise ValueError("tpu.pipeline=chunked requires an integer scale "
                         "(tiled merge geometry)")

    # channel-first accumulators: TPU tiling pads minor-most dims to (8, 128).
    # With the Pallas merge the carry lives at the kernel's padded geometry so
    # every frame accumulates IN PLACE (input/output aliasing); cropped once
    # before the reference merge.
    merge_fn = select_merge(config)
    accum_shape = (n_ch, out_h, out_w)
    if chunked or getattr(merge_fn, "__name__", "") == "merge_pallas":
        from ..ops.pallas_merge import padded_accum_shape
        accum_shape = padded_accum_shape(config, (h, w), n_ch)
    num = jnp.zeros(accum_shape, DEFAULT_FLOAT)
    den = jnp.zeros(accum_shape, DEFAULT_FLOAT)
    acc_r = jnp.zeros((h, w), DEFAULT_FLOAT) if accumulate_r else None

    debug = {}
    if pipe_mode == "vmapped":
        # EXPERIMENTAL (round-5 lever #1): batch the analysis phase
        # (align / robustness / kernels — no cross-frame dependencies)
        # across frames with vmap so every per-launch fixed cost is paid
        # once for the whole burst (the Pallas batching rule folds the
        # frame axis into the kernel grids), then scan ONLY the merge
        # (num/den accumulation is the sole sequential dependency).
        # Memory: the same per-frame flow/robustness/covariance stacks the
        # fused/chunked modes already materialize.
        def analyze_one(frame):
            grey = to_grey(frame)
            flow = to_raw_flow(align(align_state, grey, config), frame.shape)
            r = compute_robustness(frame, ref_stats, flow, cfa_pattern,
                                   white_balance, config)
            covs = estimate_kernels(frame, config)
            return flow, r, covs

        flows, rmaps, covs_stack = jax.vmap(analyze_one)(comp_imgs)
        if acc_r is not None:
            acc_r = jnp.sum(rmaps, axis=0)

        def merge_step(carry, xs):
            num, den = carry
            frame, flow, r, covs = xs
            num, den = merge_fn(frame, flow, covs, r, num, den,
                                cfa_pattern, config)
            return (num, den), None

        (num, den), _ = jax.lax.scan(
            merge_step, (num, den), (comp_imgs, flows, rmaps, covs_stack))
        num = num[:, :out_h, :out_w]
        den = den[:, :out_h, :out_w]
        ref_covs = estimate_kernels(ref_img, config)
        merge_ref_fn = select_merge_ref(config)
        num, den = merge_ref_fn(ref_img, ref_covs, num, den, cfa_pattern,
                                config,
                                acc_rob=acc_r if robustness_denoise else None)
        image = jnp.transpose(
            normalize_accum(num, den, refill_border=REFILL_BORDER),
            (1, 2, 0))
        if debug_mode:
            debug["flow"] = flows
            debug["robustness"] = rmaps
        if acc_r is not None:
            debug["accumulated_robustness"] = acc_r
        return image, debug
    if fused or chunked:
        # Phase A (analysis): scan over frames producing per-frame flow,
        # robustness and covariances. Phase B (fused merge): every frame
        # accumulated per HR tile in VMEM; num/den never round-trip HBM.
        def analyze(acc_r, frame):
            grey = to_grey(frame)
            flow = to_raw_flow(align(align_state, grey, config), frame.shape)
            r = compute_robustness(frame, ref_stats, flow, cfa_pattern,
                                   white_balance, config)
            if acc_r is not None:
                acc_r = acc_r + r
            covs = estimate_kernels(frame, config)
            return acc_r, (flow, r, covs)

        acc_r, (flows, rmaps, covs_stack) = jax.lax.scan(
            analyze, acc_r, comp_imgs)
        ref_covs = estimate_kernels(ref_img, config)
        if chunked:
            num, den = _merge_burst_chunked(
                comp_imgs, flows, covs_stack, rmaps, num, den,
                cfa_pattern, config)
            num = num[:, :out_h, :out_w]
            den = den[:, :out_h, :out_w]
            merge_ref_fn = select_merge_ref(config)
            num, den = merge_ref_fn(
                ref_img, ref_covs, num, den, cfa_pattern, config,
                acc_rob=acc_r if robustness_denoise else None)
            image = jnp.transpose(
            normalize_accum(num, den, refill_border=REFILL_BORDER),
            (1, 2, 0))
        else:
            fused_impl = merge_burst_slab \
                if config.get("tpu", {}).get("fused_impl", "slab") == "slab" \
                else merge_burst_tiled
            image = fused_impl(
                comp_imgs, flows, covs_stack, rmaps, ref_img, ref_covs,
                cfa_pattern, config,
                acc_rob=acc_r if robustness_denoise else None)
            image = jnp.transpose(image, (1, 2, 0))
        if debug_mode:
            debug["flow"] = flows
            debug["robustness"] = rmaps
    else:
        def step(carry, frame):
            num, den, acc_r = carry
            grey = to_grey(frame)
            flow = to_raw_flow(align(align_state, grey, config), frame.shape)
            r = compute_robustness(frame, ref_stats, flow, cfa_pattern,
                                   white_balance, config)
            if acc_r is not None:
                acc_r = acc_r + r
            covs = estimate_kernels(frame, config)
            num, den = merge_fn(frame, flow, covs, r, num, den, cfa_pattern,
                                config)
            ys = (flow, r) if debug_mode else None
            return (num, den, acc_r), ys

        (num, den, acc_r), ys = jax.lax.scan(step, (num, den, acc_r), comp_imgs)
        num = num[:, :out_h, :out_w]
        den = den[:, :out_h, :out_w]

        # ---- reference frame accumulation
        ref_covs = estimate_kernels(ref_img, config)
        merge_ref_fn = select_merge_ref(config)
        num, den = merge_ref_fn(ref_img, ref_covs, num, den, cfa_pattern,
                                config,
                                acc_rob=acc_r if robustness_denoise else None)
        image = jnp.transpose(
            normalize_accum(num, den, refill_border=REFILL_BORDER),
            (1, 2, 0))
        # -> (H*s, W*s, c)
        if debug_mode and ys is not None:
            debug["flow"] = ys[0]
            debug["robustness"] = ys[1]

    if acc_r is not None:
        debug["accumulated_robustness"] = acc_r
    return image, debug


def make_pipeline(config, cfa_pattern, white_balance, jit=True):
    """Build a (jitted) pipeline closure over the static configuration.

    The returned callable takes ``(ref_img, comp_imgs, std_curve, diff_curve)``
    — all device arrays — so noise curves stay data (no retrace per ISO).
    """
    cfa = np.asarray(cfa_pattern)
    wb = [float(x) for x in white_balance]
    fn = partial(run_pipeline, config=config, cfa_pattern=cfa, white_balance=wb)
    if not jit:
        return fn
    jfn = jax.jit(fn)
    from ..ops.grey import grey_consts_for

    def with_grey_consts(ref_img, comp_imgs, std_curve, diff_curve):
        # device circulants computed EAGERLY once per size and fed through
        # the jit boundary as arguments: keeps the grey low-pass matrices
        # out of both the StableHLO literal payload (~400 MB at 12MP) and
        # the steady-state program (~54 ms/call in-trace expansion) —
        # grey.grey_matmul_consts docstring has the numbers.
        return jfn(ref_img, comp_imgs, std_curve, diff_curve,
                   grey_consts=grey_consts_for(config, ref_img.shape))

    return with_grey_consts
