"""Matmul bilateral grid: full-resolution dense-CRF filtering on the MXU.

The round-1 engines pay for their splat/blur/slice in ways TPUs hate:
``lattice.py`` resolves neighbors with a 5.5M-element merge sort per plan
(~180 ms at 321^2) and both it and ``grid.py`` slice with 32-corner row
gathers (~27 ms/iteration — TPU gathers of 84-byte rows run at ~2% of HBM
bandwidth).  This engine has NO gathers, NO scatters and NO sorts anywhere:

  * **splat / slice**: multilinear color interpolation recast as MXU
    matmuls.  Pixels are tiled by spatial cell; the (b, g) interpolation
    becomes ``(tile_px x gc^2) @ (gc^2 x gc*C)`` against that cell's color
    cube (one-hot-weight matmul) and the r axis a 2-sparse contraction done
    as a small aligned GEMM.  Splat is the exact transpose, so the
    effective kernel is S^T B S — symmetric, like the reference's
    barycentric splat/slice pair (``CRF/src/permutohedral.cpp``).  The dense
    one-hot matmul does ~100x redundant FLOPs versus the true corner
    sparsity — and still wins big: the MXU is nearly free, gathers are not.
  * **spatial bilinear**: instead of 4 corner matmuls per pixel, the grid's
    spatial axes are bilinearly resampled ONCE per filter to half-cell
    nodes (a tiny banded tensordot); pixels then read their half-cell tile's
    cube directly.  This quantizes the spatial position of the *bilinearly
    interpolated* field to sigma_xy/2 (~40 px against an 80 px sigma), an
    error the unit tests bound against the exact engine (99.9%+ argmax).
    Pass ``spatial_exact=True`` (or use an odd cell size) for true
    per-pixel 4-corner bilinear at ~4x the matmul cost.
  * **blur**: three separable radius-2 color passes as pure shift-adds; the
    two SPATIAL blur passes are folded into the splat-side resample matrix
    (``down = blur_band @ half_cell^T`` — associativity of the linear ops),
    so they cost nothing per filter.

TPU layout notes (the difference between 24 ms and ~5 ms per iteration):
every hot array keeps ``gc*C`` (~441) as its LAST dim — fp32/bf16 tiles are
(8, 128)/(16, 128), so a trailing (21, 21) pair would pad to (24, 128), a
6.9x memory blowup.  The r-axis blur therefore shifts by whole C-blocks
*inside* the flattened last dim, and the per-pixel r-contraction is a GEMM
with a fixed (gc*C, C) summing matrix instead of a reshape to (..., gc, C).
For the same reason the per-pixel VALUES cross the filter boundary
channel-first — (C, H, W) outside, (T, C, px) at the kernel edge — so the
mean-field's elementwise work (softmax, masking, message sums) runs on
~11 MB arrays instead of 6x-padded 66 MB ones; the (px, C)-shaped matmul
operands exist only inside the Pallas kernels' VMEM.

Reference behavior being approximated: the O(N (d+1)) permutohedral filter
(``CRF/src/permutohedral.cpp:476-589``); parameterization per
``CRF/krahenbuhl2013/CRF.py:31-32``.  sigma_xy is quantized to an integer
pixel count (exact for the inference config: 80.0/1.0).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from dsrg_tpu.ops.crf.grid import separable_gaussian_filter_cf

_F32 = jnp.float32
_BF16 = jnp.bfloat16
_CORNERS = ((0, 0), (0, 1), (1, 0), (1, 1))
# radius-2 discrete Gaussian in cell units (cell size == sigma), matching
# grid.py's _axis_blur_matrix(sigma=1, truncate=2)
_BLUR_W = np.exp(-0.5 * np.arange(3) ** 2).astype(np.float32)


def _shift_blur(g: jnp.ndarray, axis: int, step: int = 1) -> jnp.ndarray:
    """Radius-2 Gaussian along ``axis`` in strides of ``step`` elements.

    ``step > 1`` blurs a dimension that lives flattened inside ``axis``
    (used for the r axis folded into the trailing gc*C dim, keeping the
    TPU-friendly wide-last-dim layout).
    """
    d = g.shape[axis]
    pad = [(0, 0)] * g.ndim
    pad[axis] = (2 * step, 2 * step)
    p = jnp.pad(g, pad)

    def sl(off):
        return jax.lax.slice_in_dim(p, (2 + off) * step, (2 + off) * step + d, axis=axis)

    return (
        _BLUR_W[0] * g
        + _BLUR_W[1] * (sl(1) + sl(-1))
        + _BLUR_W[2] * (sl(2) + sl(-2))
    )


def _half_cell_matrix(n_nodes: int, n_half: int) -> np.ndarray:
    """(n_half, n_nodes) bilinear sampling at positions (j + 0.5) / 2 cells."""
    b = np.zeros((n_half, n_nodes), np.float32)
    for j in range(n_half):
        pos = (j + 0.5) / 2.0
        lo = min(int(math.floor(pos)), n_nodes - 2)
        f = pos - lo
        b[j, lo] = 1.0 - f
        b[j, lo + 1] = f
    return b


def _blur_band(n: int) -> np.ndarray:
    """(n, n) banded matrix form of ``_shift_blur`` (zero boundary)."""
    d = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :])
    out = np.zeros((n, n), np.float32)
    for k, wk in enumerate(_BLUR_W):
        out[d == k] = wk
    return out


class MMGridPlan:
    """Image-dependent interpolation weights; build once, filter many times."""

    def __init__(
        self,
        guide: jnp.ndarray,
        sigma_xy: float,
        sigma_rgb: float,
        spatial_exact: bool = False,
        use_pallas: bool = True,
    ):
        self.use_pallas = use_pallas
        h, w, _ = guide.shape
        self.h, self.w = h, w
        s = max(int(round(sigma_xy)), 1)  # spatial cell size in pixels
        self.s = s
        # fast path: pixels tile by half-cells (s/2 px); exact path: by cells
        self.exact = bool(spatial_exact or (s % 2 != 0))
        self.ts = s if self.exact else s // 2  # pixel tile size
        ts = self.ts
        nty, ntx = -(-h // ts), -(-w // ts)
        hp, wp = nty * ts, ntx * ts
        gy = -(-hp // s) + 1
        gx = -(-wp // s) + 1
        gc = int(math.floor(255.0 / sigma_rgb)) + 2
        self.nty, self.ntx, self.gy, self.gx, self.gc = nty, ntx, gy, gx, gc
        self.hp, self.wp = hp, wp
        self.n_tiles = nty * ntx
        self.tile_px = ts * ts
        self.np_ = hp * wp

        img = jnp.round(guide.astype(_F32))
        img = jnp.pad(img, ((0, hp - h), (0, wp - w), (0, 0)))
        # tile the 3-channel image FIRST (a 1.5 MB transpose), then build the
        # fat weight arrays directly in tiled order — tiling the (np, gc^2)
        # weights after the fact is a ~114 MB 5-D shuffle (~6 ms on TPU)
        cs = self._tile(img) / sigma_rgb  # (T, px, 3) in [0, 255/sigma_rgb]

        lo_c = jnp.clip(jnp.floor(cs).astype(jnp.int32), 0, gc - 2)
        fc = jnp.clip(cs - lo_c.astype(_F32), 0.0, 1.0)

        def interp_1d(lo, f):  # 2-sparse (T, px, gc) interpolation rows
            # iota-compare instead of eye[lo] row gathers: TPU gathers of
            # short rows run at a few % of HBM bandwidth, compares are free
            iota = jnp.arange(gc, dtype=jnp.int32)[None, None, :]
            hit_lo = (iota == lo[..., None]).astype(_F32)
            hit_hi = (iota == (lo + 1)[..., None]).astype(_F32)
            return hit_lo * (1.0 - f)[..., None] + hit_hi * f[..., None]

        wb = interp_1d(lo_c[..., 0], fc[..., 0])
        wg = interp_1d(lo_c[..., 1], fc[..., 1])
        wbg = jnp.einsum("tpb,tpg->tpbg", wb, wg).reshape(
            self.n_tiles, self.tile_px, gc * gc
        )
        self.wbg = wbg.astype(_BF16)  # (T, px, gc^2) bf16, slice side
        # r weights kept 21-wide-first (T, gc, px): the Pallas kernels expand
        # them to (px, gc*C) in VMEM instead of streaming that from HBM
        self.wr_t = jnp.swapaxes(interp_1d(lo_c[..., 2], fc[..., 2]), 1, 2)
        self._wbg_t = None

        if self.exact:
            ys = jnp.broadcast_to(jnp.arange(hp, dtype=_F32)[:, None] / s, (hp, wp))
            xs = jnp.broadcast_to(jnp.arange(wp, dtype=_F32)[None, :] / s, (hp, wp))
            fy = (ys - jnp.floor(ys)).reshape(self.np_)
            fx = (xs - jnp.floor(xs)).reshape(self.np_)
            sw = jnp.stack(
                [(1 - fy) * (1 - fx), (1 - fy) * fx, fy * (1 - fx), fy * fx], axis=-1
            )
            self.sw = self._tile(sw)  # (T, px, 4)
        else:
            by = _half_cell_matrix(gy, nty)
            bx = _half_cell_matrix(gx, ntx)
            self.by = jnp.asarray(by)  # (nty, gy) slice-side up-resample
            self.bx = jnp.asarray(bx)
            # splat-side down-resample with the spatial blur FOLDED IN:
            # blur(by^T @ g) == (blur_band @ by^T) @ g, so the two full-grid
            # spatial blur passes per filter become free
            self.dy = jnp.asarray(_blur_band(gy) @ by.T)  # (gy, nty)
            self.dx = jnp.asarray(_blur_band(gx) @ bx.T)  # (gx, ntx)

        # per-C-channel-count caches (built lazily in _mats)
        self._mats_cache: dict = {}

    @property
    def wbg_t(self) -> jnp.ndarray:
        """(T, gc^2, px) splat-side transpose; lazy — only the XLA/exact
        paths read it (the Pallas splat contracts over px on wbg directly)."""
        if self._wbg_t is None:
            self._wbg_t = jnp.swapaxes(self.wbg, 1, 2)
        return self._wbg_t

    def _mats(self, c: int):
        """Layout-friendly helper mats for channel count ``c``.

        tile_mat (C, gc*C): v -> v replicated per r-bin;
        sum_mat (gc*C, C): r-contraction summing matrix;
        expand (gc, gc*C): 0/1 r-bin -> wide-dim expansion;
        wr_exp (T, px, gc*C): per-pixel r weights expanded to the wide dim
        (XLA fallback/exact paths only — the Pallas kernels rebuild it in
        VMEM from wr_t and ``expand``; XLA DCEs it when unused).
        """
        if c not in self._mats_cache:
            gc = self.gc
            tile_mat = jnp.asarray(np.tile(np.eye(c, dtype=np.float32), (1, gc)))
            sum_mat = jnp.asarray(np.tile(np.eye(c, dtype=np.float32), (gc, 1)))
            expand = np.zeros((gc, gc * c), np.float32)
            for r in range(gc):
                expand[r, r * c : (r + 1) * c] = 1.0
            expand = jnp.asarray(expand)
            wr_exp = jnp.einsum("trp,rq->tpq", self.wr_t, expand)
            self._mats_cache[c] = (tile_mat, sum_mat, expand, wr_exp)
        return self._mats_cache[c]

    def _tile(self, arr: jnp.ndarray) -> jnp.ndarray:
        """(np, X) pixel-major -> (n_tiles, tile_px, X)."""
        x = arr.reshape(self.nty, self.ts, self.ntx, self.ts, -1)
        return x.transpose(0, 2, 1, 3, 4).reshape(self.n_tiles, self.tile_px, -1)

    def _untile(self, arr: jnp.ndarray) -> jnp.ndarray:
        x = arr.reshape(self.nty, self.ntx, self.ts, self.ts, -1)
        return x.transpose(0, 2, 1, 3, 4).reshape(self.hp, self.wp, -1)

    def pad(self, values: jnp.ndarray) -> jnp.ndarray:
        return jnp.pad(values, ((0, self.hp - self.h), (0, self.wp - self.w), (0, 0)))

    def _tile_cf(self, arr: jnp.ndarray) -> jnp.ndarray:
        """(C, hp, wp) channel-first -> (n_tiles, C, tile_px)."""
        c = arr.shape[0]
        x = arr.reshape(c, self.nty, self.ts, self.ntx, self.ts)
        return x.transpose(1, 3, 0, 2, 4).reshape(self.n_tiles, c, self.tile_px)

    def _untile_cf(self, arr: jnp.ndarray) -> jnp.ndarray:
        c = arr.shape[1]
        x = arr.reshape(self.nty, self.ntx, c, self.ts, self.ts)
        return x.transpose(2, 0, 3, 1, 4).reshape(c, self.hp, self.wp)

    def pad_cf(self, values: jnp.ndarray) -> jnp.ndarray:
        return jnp.pad(
            values, ((0, 0), (0, self.hp - self.h), (0, self.wp - self.w))
        )

    # -- the filter -----------------------------------------------------------

    def _splat_u(self, values: jnp.ndarray) -> jnp.ndarray:
        """(H, W, C) -> (T, px, gc*C) bf16 splat operand u[p, r*C+c] = wr*v."""
        c = values.shape[-1]
        tile_mat, _, _, wr_exp = self._mats(c)
        v = self._tile(self.pad(values))  # (T, px, C)
        return (jnp.einsum("tpc,cq->tpq", v, tile_mat) * wr_exp).astype(_BF16)

    def _rcontract(self, tt: jnp.ndarray, c: int) -> jnp.ndarray:
        """(T, px, gc*C) fp32 -> (T, px, C): weight by wr, sum over r bins."""
        _, sum_mat, _, wr_exp = self._mats(c)
        return jnp.einsum("tpq,qc->tpc", tt * wr_exp, sum_mat)

    def filter(self, values: jnp.ndarray) -> jnp.ndarray:
        """Approximate K @ values for (H, W, C) values (C small, e.g. 21)."""
        return self.filter_cf(values.transpose(2, 0, 1)).transpose(1, 2, 0)

    def filter_cf(self, values: jnp.ndarray) -> jnp.ndarray:
        """Channel-first filter: (C, H, W) -> (C, H, W).

        The production layout — elementwise callers stay channel-first so
        their arrays keep a lane-wide minor dim (see module docstring).
        """
        if self.exact:
            if self.use_pallas:
                return self._filter_exact_cf(values)
            # XLA fallback: pixel-major 4-corner path
            return self._filter_exact(values.transpose(1, 2, 0)).transpose(2, 0, 1)

        c = values.shape[0]
        gy, gx, gc, t = self.gy, self.gx, self.gc, self.n_tiles
        v = self._tile_cf(self.pad_cf(values))  # (T, C, px)

        if self.use_pallas:
            from dsrg_tpu.ops.crf.pallas_mmgrid import splat_fused

            tile_mat, _, expand, _ = self._mats(c)
            g2 = splat_fused(
                self.wbg, v, self.wr_t.astype(_BF16), expand.astype(_BF16),
                tile_mat.astype(_BF16),
            )
        else:
            tile_mat, _, _, wr_exp = self._mats(c)
            u = (jnp.einsum("tcp,cq->tpq", v, tile_mat) * wr_exp).astype(_BF16)
            g2 = jnp.einsum(
                "tbp,tpq->tbq", self.wbg_t, u, preferred_element_type=_F32
            )
        g2 = g2.reshape(self.nty, self.ntx, gc * gc, gc * c)
        # down-resample with the spatial blur pre-folded into dy/dx
        grid = jnp.tensordot(self.dy, g2, axes=1)
        grid = jnp.moveaxis(jnp.tensordot(self.dx, grid, axes=((1,), (1,))), 0, 1)

        # color blur in (gy, gx, gc, gc, gc*C) layout; r inside the last dim
        g5 = grid.reshape(gy, gx, gc, gc, gc * c)
        g5 = _shift_blur(_shift_blur(g5, 2), 3)
        g5 = _shift_blur(g5, 4, step=c)
        gf = g5.reshape(gy, gx, gc * gc, gc * c)

        g2 = jnp.tensordot(self.by, gf, axes=1)
        g2 = jnp.moveaxis(jnp.tensordot(self.bx, g2, axes=((1,), (1,))), 0, 1)
        slab = g2.reshape(t, gc * gc, gc * c).astype(_BF16)
        if self.use_pallas:
            from dsrg_tpu.ops.crf.pallas_mmgrid import slice_fused

            _, sum_mat, expand, _ = self._mats(c)
            out = slice_fused(
                self.wbg, slab, self.wr_t.astype(_BF16), expand.astype(_BF16),
                sum_mat.astype(_BF16),
            )
        else:
            tt = jnp.einsum(
                "tpb,tbq->tpq", self.wbg, slab, preferred_element_type=_F32
            )
            _, sum_mat, _, wr_exp = self._mats(c)
            out = jnp.einsum("tpq,qc->tcp", tt * wr_exp, sum_mat)
        return self._untile_cf(out)[:, : self.h, : self.w]

    def _filter_exact_cf(self, values: jnp.ndarray) -> jnp.ndarray:
        """Odd-cell / parity 4-corner path on the fused Pallas kernels.

        The per-corner spatial bilinear weight FOLDS INTO the r-weights —
        ``sw_ci * (tt * wr_exp) @ sum == (tt * (sw_ci*wr_exp)) @ sum`` and
        symmetrically on the splat side — so the same ``splat_fused`` /
        ``slice_fused`` kernels serve this path with a corner-scaled
        ``wr_t`` operand and no kernel changes (closes the one remaining
        XLA-only mmgrid mode; VERDICT r2 item 8; reference role:
        ``permutohedral.cpp:476-527`` exact barycentric splat/slice).
        """
        from dsrg_tpu.ops.crf.pallas_mmgrid import slice_fused, splat_fused

        c = values.shape[0]
        gy, gx, gc, t = self.gy, self.gx, self.gc, self.n_tiles
        v = self._tile_cf(self.pad_cf(values))  # (T, C, px)
        tile_mat, sum_mat, expand, _ = self._mats(c)
        wr_corner = [
            (self.wr_t * self.sw[:, None, :, ci]).astype(_BF16) for ci in range(4)
        ]

        grid = jnp.zeros((gy, gx, gc * gc, gc * c), _F32)
        for ci, (dy, dx) in enumerate(_CORNERS):
            g2 = splat_fused(
                self.wbg, v, wr_corner[ci], expand.astype(_BF16),
                tile_mat.astype(_BF16),
            ).reshape(self.nty, self.ntx, gc * gc, gc * c)
            grid = grid.at[dy : dy + self.nty, dx : dx + self.ntx].add(g2)

        g5 = grid.reshape(gy, gx, gc, gc, gc * c)
        for axis in range(4):
            g5 = _shift_blur(g5, axis)
        g5 = _shift_blur(g5, 4, step=c)
        gf = g5.reshape(gy, gx, gc * gc, gc * c).astype(_BF16)

        out = jnp.zeros((t, c, self.tile_px), _F32)
        for ci, (dy, dx) in enumerate(_CORNERS):
            slab = gf[dy : dy + self.nty, dx : dx + self.ntx].reshape(
                t, gc * gc, gc * c
            )
            out = out + slice_fused(
                self.wbg, slab, wr_corner[ci], expand.astype(_BF16),
                sum_mat.astype(_BF16),
            )
        return self._untile_cf(out)[:, : self.h, : self.w]

    def _filter_exact(self, values: jnp.ndarray) -> jnp.ndarray:
        """Per-pixel 4-corner spatial bilinear path (odd cells / parity)."""
        c = values.shape[-1]
        gy, gx, gc, t = self.gy, self.gx, self.gc, self.n_tiles

        u = self._splat_u(values)
        grid = jnp.zeros((gy, gx, gc * gc, gc * c), _F32)
        for ci, (dy, dx) in enumerate(_CORNERS):
            uc = (self.sw[:, :, ci : ci + 1] * u.astype(_F32)).astype(_BF16)
            block = jnp.einsum(
                "tbp,tpq->tbq", self.wbg_t, uc, preferred_element_type=_F32
            ).reshape(self.nty, self.ntx, gc * gc, gc * c)
            grid = grid.at[dy : dy + self.nty, dx : dx + self.ntx].add(block)

        # blur all five axes; r blurred inside the last dim
        g5 = grid.reshape(gy, gx, gc, gc, gc * c)
        for axis in range(4):
            g5 = _shift_blur(g5, axis)
        g5 = _shift_blur(g5, 4, step=c)
        gf = g5.reshape(gy, gx, gc * gc, gc * c).astype(_BF16)

        out = jnp.zeros((t, self.tile_px, c), _F32)
        for ci, (dy, dx) in enumerate(_CORNERS):
            slab = gf[dy : dy + self.nty, dx : dx + self.ntx].reshape(
                t, gc * gc, gc * c
            )
            tt = jnp.einsum(
                "tpb,tbq->tpq", self.wbg, slab, preferred_element_type=_F32
            )
            out = out + self.sw[:, :, ci : ci + 1] * self._rcontract(tt, c)
        return self._untile(out)[: self.h, : self.w]


def mean_field_mmgrid(
    unary: jnp.ndarray,
    image: jnp.ndarray,
    n_iters: int = 10,
    scale_factor: float = 1.0,
    color_factor: float = 13.0,
    w_bilateral: float = 10.0,
    w_spatial: float = 3.0,
    valid_mask: jnp.ndarray | None = None,
    spatial_exact: bool = False,
    use_pallas: bool = True,
) -> jnp.ndarray:
    """Matmul-grid mean field with the reference CRF() parameterization.

    ``valid_mask``: optional (H, W) {0,1} mask for padded batch members —
    masked splat + masked symmetric normalization make a shared padded canvas
    exact for each image's valid region (same contract as
    ``lattice.mean_field_lattice``).
    """
    h, w, m = unary.shape
    img = jnp.round(image.astype(_F32))
    plan = MMGridPlan(img, 80.0 / scale_factor, color_factor, spatial_exact, use_pallas)
    s_g = 3.0 / scale_factor

    # the loop state lives channel-first: (C, H, W) keeps the wide W dim in
    # the 128-lane tile so the per-iteration elementwise work (softmax,
    # masking, message sums) moves ~11 MB, not 6x-padded 66 MB
    unary_cf = unary.transpose(2, 0, 1)
    mask = (
        jnp.ones((1, h, w), _F32)
        if valid_mask is None
        else valid_mask.astype(_F32)[None]
    )
    norm_b = jax.lax.rsqrt(plan.filter_cf(mask) + 1e-20)
    norm_s = jax.lax.rsqrt(separable_gaussian_filter_cf(mask, s_g) + 1e-20)

    def message(q):
        qm = q * mask
        mb = norm_b * plan.filter_cf(norm_b * qm)
        ms = norm_s * separable_gaussian_filter_cf(norm_s * qm, s_g)
        return (w_bilateral * mb + w_spatial * ms) * mask

    q = jax.nn.softmax(unary_cf, axis=0)

    def body(_, q):
        return jax.nn.softmax(unary_cf + message(q), axis=0)

    return jax.lax.fori_loop(0, n_iters, body, q).transpose(1, 2, 0)
