"""Pallas TPU kernel: fused spectrum placement + phase ramp + ray reduction.

The XLA path of pipeline stage 7 materializes two [rows, F_base] complex64
intermediates in HBM — the placement matmul output ``Xb`` and the per-row
phase ramp product — ~4x the size of all other stage traffic combined
(2 x 2.1 GB at the bench shape). This kernel keeps both in VMEM:

  per row tile (rows = flattened (group, shower, ray), channel-major):
    1. MXU: E = V.re @ D_r + V.im @ D_i            (complex placement DFT)
    2. VPU: factored phase ramp from the row's time offset
       (k = 32a + b outer product => ~65 transcendentals/row, not F_base)
    3. multiply + strided accumulation over the (shower, ray) axis
  output: chan_spec rows [rows / S2, F_base]

Numerically identical to the XLA path up to f32 rounding. Select with
PipelineSettings(placement_impl="pallas"); "xla" stays the default until
the kernel is benchmarked on the target chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BLOCK = 128         # phase-table factorization: k = _BLOCK * a + b
                     # (exactly one lane register wide: the [R, n_hi, 128]
                     # -> [R, n_hi*128] merge is then layout-preserving)


def _kernel(vr_ref, vi_ref, off_ref, drr_ref, dri_ref, dir_ref, dii_ref,
            out_re_ref, out_im_ref, *, s2: int, df: float, f_base: int,
            mm_dtype=jnp.float32):
    from jax.experimental import pallas as pl  # noqa: F401

    vr = vr_ref[:].astype(mm_dtype)   # [R_t, F_int]
    vi = vi_ref[:].astype(mm_dtype)
    # 1. placement DFT on the MXU (D = D_r + i D_i per input plane).
    # D arrives column-padded to f_base = n_hi * _BLOCK (lane-aligned):
    # every epilogue op below runs at a 128-multiple width, so Mosaic never
    # masks or relayouts (the unpadded 1025-wide epilogue was the dominant
    # kernel cost); the padded columns are exact zeros end to end.
    xb_re = (jnp.dot(vr, drr_ref[:], preferred_element_type=jnp.float32)
             + jnp.dot(vi, dir_ref[:], preferred_element_type=jnp.float32))
    xb_im = (jnp.dot(vr, dri_ref[:], preferred_element_type=jnp.float32)
             + jnp.dot(vi, dii_ref[:], preferred_element_type=jnp.float32))

    # 2. factored phase ramp exp(-2 pi i k df t): tables w^b and (w^B)^a
    r_t = vr.shape[0]
    theta = jnp.asarray(-2.0 * np.pi * df, jnp.float32) * off_ref[:, 0]
    n_hi = f_base // _BLOCK
    # iota must be integer on TPU (tpu.iota verification)
    b = jax.lax.broadcasted_iota(jnp.int32, (r_t, _BLOCK), 1).astype(jnp.float32)
    a = (jax.lax.broadcasted_iota(jnp.int32, (r_t, n_hi), 1)
         .astype(jnp.float32) * _BLOCK)
    tb = theta[:, None] * b
    ta = theta[:, None] * a
    wb_re, wb_im = jnp.cos(tb), jnp.sin(tb)
    wa_re, wa_im = jnp.cos(ta), jnp.sin(ta)
    # apply the factored phase directly in the [r, n_hi, _BLOCK] view
    # (one broadcast complex multiply per factor; the [r, f_base] phase
    # product is never materialized)
    xr = xb_re.reshape(r_t, n_hi, _BLOCK)
    xi = xb_im.reshape(r_t, n_hi, _BLOCK)
    t_re = xr * wb_re[:, None, :] - xi * wb_im[:, None, :]
    t_im = xr * wb_im[:, None, :] + xi * wb_re[:, None, :]
    y_re = (t_re * wa_re[:, :, None]
            - t_im * wa_im[:, :, None]).reshape(r_t, f_base)
    y_im = (t_re * wa_im[:, :, None]
            + t_im * wa_re[:, :, None]).reshape(r_t, f_base)

    # 3. (shower, ray) reduction: rows are channel-major consecutive groups
    # (shower, ray) reduction as a reshape-sum (strided slices lower to
    # unsupported gathers in Mosaic)
    out_re_ref[:] = jnp.sum(y_re.reshape(r_t // s2, s2, f_base), axis=1)
    out_im_ref[:] = jnp.sum(y_im.reshape(r_t // s2, s2, f_base), axis=1)


def _chain_kernel(sr_ref, si_ref, att_ref, cr_ref, ci_ref, mask_ref,
                  oh_ref, off_ref,
                  w_ref, tr_ref, ti_ref,
                  drr_ref, dri_ref, dir_ref, dii_ref,
                  out_re_ref, out_im_ref, *, s2: int, df: float, f_base: int,
                  mm_dtype=jnp.float32):
    """v2: spectrum x interpolated attenuation x (one-hot) template x scalar
    factors, then the v1 placement DFT + phase + reduction — the whole
    factored propagation chain without HBM intermediates."""
    att = jnp.dot(att_ref[:], w_ref[:],
                  preferred_element_type=jnp.float32)          # [R_t, F_int]
    tpl_re = jnp.dot(oh_ref[:], tr_ref[:],
                     preferred_element_type=jnp.float32)       # [R_t, F_int]
    tpl_im = jnp.dot(oh_ref[:], ti_ref[:],
                     preferred_element_type=jnp.float32)
    # volt = template * combined * spec * att  (complex x complex x real)
    sa_re = sr_ref[:] * att
    sa_im = si_ref[:] * att
    cr = cr_ref[:]                    # [R_t, 1]
    ci = ci_ref[:]
    cs_re = cr * sa_re - ci * sa_im
    cs_im = cr * sa_im + ci * sa_re
    vr = tpl_re * cs_re - tpl_im * cs_im
    vi = tpl_re * cs_im + tpl_im * cs_re
    # select (not multiply): invalid solution slots may carry non-finite
    # spectra that 0 * x would propagate as NaN
    m = mask_ref[:] > 0.5             # [R_t, 1]
    vr = jnp.where(m, vr, 0.0).astype(mm_dtype)
    vi = jnp.where(m, vi, 0.0).astype(mm_dtype)

    xb_re = (jnp.dot(vr, drr_ref[:], preferred_element_type=jnp.float32)
             + jnp.dot(vi, dir_ref[:], preferred_element_type=jnp.float32))
    xb_im = (jnp.dot(vr, dri_ref[:], preferred_element_type=jnp.float32)
             + jnp.dot(vi, dii_ref[:], preferred_element_type=jnp.float32))

    r_t = vr.shape[0]
    theta = jnp.asarray(-2.0 * np.pi * df, jnp.float32) * off_ref[:, 0]
    n_hi = f_base // _BLOCK   # f_base arrives lane-aligned (see _kernel)
    # iota must be integer on TPU (tpu.iota verification)
    b = jax.lax.broadcasted_iota(jnp.int32, (r_t, _BLOCK), 1).astype(jnp.float32)
    a = (jax.lax.broadcasted_iota(jnp.int32, (r_t, n_hi), 1)
         .astype(jnp.float32) * _BLOCK)
    tb = theta[:, None] * b
    ta = theta[:, None] * a
    wb_re, wb_im = jnp.cos(tb), jnp.sin(tb)
    wa_re, wa_im = jnp.cos(ta), jnp.sin(ta)
    xr = xb_re.reshape(r_t, n_hi, _BLOCK)
    xi = xb_im.reshape(r_t, n_hi, _BLOCK)
    t_re = xr * wb_re[:, None, :] - xi * wb_im[:, None, :]
    t_im = xr * wb_im[:, None, :] + xi * wb_re[:, None, :]
    y_re = (t_re * wa_re[:, :, None]
            - t_im * wa_im[:, :, None]).reshape(r_t, f_base)
    y_im = (t_re * wa_im[:, :, None]
            + t_im * wa_re[:, :, None]).reshape(r_t, f_base)

    # (shower, ray) reduction as a reshape-sum (strided slices lower to
    # unsupported gathers in Mosaic)
    out_re_ref[:] = jnp.sum(y_re.reshape(r_t // s2, s2, f_base), axis=1)
    out_im_ref[:] = jnp.sum(y_im.reshape(r_t // s2, s2, f_base), axis=1)


def chain_placement_reduce(spec_re, spec_im, att_sparse, comb_re, comb_im,
                           mask, tpl_idx, offsets, W, templates, D_r, D_i, *,
                           s2: int, df: float, n_templates: int,
                           row_tile: int = 256, matmul_dtype=jnp.float32):
    """Fused factored-chain placement:

        out rows = sum over s2-blocks of
          ((template[tpl_idx] * combined * spec * (att_sparse @ W)) @ D)
          * exp(-2 pi i f offset)

    spec_* : [R, F_int] f32; att_sparse : [R, n_sparse] f32;
    comb_* : [R] f32; mask : [R] f32 validity (invalid rows zeroed by
    SELECT, so non-finite garbage in their spectra cannot poison the
    output); tpl_idx : [R] int32 row into
    ``templates`` [n_templates, F_int] complex (DC mask premultiplied);
    W : [n_sparse, F_int] f32. Returns [R // s2, F_pad] (re, im) where
    F_pad = F_base rounded up to a 128 multiple — the caller slices
    ``[:, :F_base]`` (the padded columns are exact zeros); keeping the
    whole kernel lane-aligned is worth the 1-extra-tile store.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, F_int = spec_re.shape
    F_base = D_r.shape[1]
    F_pad = -(-F_base // _BLOCK) * _BLOCK
    n_sparse = att_sparse.shape[1]
    comb_re = comb_re.reshape(R, 1)
    comb_im = comb_im.reshape(R, 1)
    mask = mask.reshape(R, 1)
    offsets = offsets.reshape(R, 1)
    assert R % row_tile == 0 and row_tile % s2 == 0

    def _pad(m):
        return jnp.pad(m, ((0, 0), (0, F_pad - F_base)))

    drr = _pad(jnp.real(D_r).astype(matmul_dtype))
    dri = _pad(jnp.imag(D_r).astype(matmul_dtype))
    dir_ = _pad(jnp.real(D_i).astype(matmul_dtype))
    dii = _pad(jnp.imag(D_i).astype(matmul_dtype))
    # shrink the tile until the working set fits scoped VMEM (~16 MB):
    # row inputs + 4 DFT matrices + ~8 row_tile x F_pad f32 temporaries
    def _vmem(rt):
        return 4 * (2 * rt * F_int + rt * (n_sparse + n_templates + 4)
                    + 4 * F_int * F_pad + 2 * n_templates * F_int
                    + n_sparse * F_int
                    + 8 * rt * F_pad + 2 * (rt // s2) * F_pad)
    while row_tile > s2 and _vmem(row_tile) > 14 * 2 ** 20 \
            and row_tile % 2 == 0 and (row_tile // 2) % s2 == 0 \
            and R % (row_tile // 2) == 0:
        row_tile //= 2
    grid = (R // row_tile,)
    out_tile = row_tile // s2
    tr = jnp.real(templates).astype(jnp.float32)
    ti = jnp.imag(templates).astype(jnp.float32)
    w32 = jnp.asarray(W, jnp.float32)
    # template row selection as a tiny one-hot matmul (vector gathers do
    # not lower well on TPU)
    onehot = (tpl_idx[:, None]
              == jnp.arange(n_templates)[None, :]).astype(jnp.float32)

    kernel = functools.partial(_chain_kernel, s2=s2, df=float(df),
                               f_base=int(F_pad), mm_dtype=matmul_dtype)
    row_spec = pl.BlockSpec((row_tile, F_int), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=[
            row_spec, row_spec,
            pl.BlockSpec((row_tile, n_sparse), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, n_templates), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            full((n_sparse, F_int)),
            full((n_templates, F_int)), full((n_templates, F_int)),
            full((F_int, F_pad)), full((F_int, F_pad)),
            full((F_int, F_pad)), full((F_int, F_pad)),
        ],
        out_specs=(
            pl.BlockSpec((out_tile, F_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_tile, F_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R // s2, F_pad), jnp.float32),
            jax.ShapeDtypeStruct((R // s2, F_pad), jnp.float32),
        ),
    )(spec_re, spec_im, att_sparse, comb_re, comb_im, mask, onehot, offsets,
      w32, tr, ti, drr, dri, dir_, dii)


def _phase_b_table(theta, t_r, phase_mode: str):
    """The k = 128a + b factorization's b-table ``e^{i theta b}`` [T, 128].

    phase_mode:
      'table'   — direct cos/sin on [T, 128]: 2 transcendentals/element,
                  ~134M sincos per kernel invocation at the bench shape —
                  the VPU special-function path is the scarce resource.
      'bitprod' — 2 transcendentals per ROW (e^{i theta}) + a 7-step
                  bit-product: w_b = prod_p (bit_p(b) ? e^{i theta 2^p} : 1)
                  — ~56 cheap VPU ops on [T, 128] instead; values differ
                  from 'table' by a few ulps (7 chained complex multiplies).
      'const'   — returns (1, 0): WRONG numerics, timing floor only.
    """
    if phase_mode == "const":
        one = jnp.ones((t_r, _BLOCK), jnp.float32)
        return one, one * 0.0
    b = jax.lax.broadcasted_iota(jnp.int32, (t_r, _BLOCK), 1)
    if phase_mode == "table":
        tb = theta * b.astype(jnp.float32)
        return jnp.cos(tb), jnp.sin(tb)
    assert phase_mode == "bitprod"
    er = jnp.cos(theta)                   # [T, 1] e^{i theta}
    ei = jnp.sin(theta)
    w_re = jnp.ones((t_r, _BLOCK), jnp.float32)
    w_im = jnp.zeros((t_r, _BLOCK), jnp.float32)
    for p in range(7):                    # 2^7 == _BLOCK
        bit = jnp.bitwise_and(
            jax.lax.shift_right_logical(b, jnp.int32(p)), jnp.int32(1)) == 1
        mr = jnp.where(bit, er, 1.0)
        mi = jnp.where(bit, ei, 0.0)
        w_re, w_im = w_re * mr - w_im * mi, w_re * mi + w_im * mr
        if p < 6:
            er, ei = er * er - ei * ei, 2.0 * er * ei
    return w_re, w_im


def _chain_kernel_v3(sr_ref, si_ref, att_ref, cr_ref, ci_ref, mask_ref,
                     oh_ref, off_ref,
                     w_ref, tr_ref, ti_ref,
                     drr_ref, dri_ref, dir_ref, dii_ref,
                     *rest, df: float, f_base: int,
                     mm_dtype=jnp.float32, phase_mode: str = "table"):
    """v3: the v2 factored chain with a LANE-ALIGNED FLAT epilogue.

    v2's epilogue views ``[r, f]`` as ``[r, n_hi, 128]`` — in Mosaic that
    reshape is a relayout (flat rows keep k along lanes/vregs; the 3D view
    remaps n_hi onto sublanes) and n_hi is sublane-ragged, so every phase
    multiply and the reshape-sum run masked/shuffled. Measured: the
    epilogue was ~24 of the kernel's 27.8 ms at ~5% of VPU peak.

    v3 never reshapes: the phase factorization k = 128a + b is applied as
    a python loop over static 128-aligned lane blocks —
    ``y_a = (X_a * wb) * wa_a`` with wb the [T,128] b-table and wa_a a
    per-row scalar lane-splat (bit-identical op order to v2) — and the
    (shower, ray) reduction moves from an in-kernel reshape-sum to grid
    revisiting: grid = (GC/T, s2) with j fastest, rows j-major, the out
    block accumulated across the s2 consecutive j steps.
    """
    from jax.experimental import pallas as pl

    if phase_mode == "input":
        wbr_ref, wbi_ref, out_re_ref, out_im_ref = rest
    else:
        out_re_ref, out_im_ref = rest
    j = pl.program_id(1)

    att = jnp.dot(att_ref[:], w_ref[:],
                  preferred_element_type=jnp.float32)          # [T, F_int]
    tpl_re = jnp.dot(oh_ref[:], tr_ref[:],
                     preferred_element_type=jnp.float32)       # [T, F_int]
    tpl_im = jnp.dot(oh_ref[:], ti_ref[:],
                     preferred_element_type=jnp.float32)
    sa_re = sr_ref[:] * att
    sa_im = si_ref[:] * att
    cr = cr_ref[:]                    # [T, 1]
    ci = ci_ref[:]
    cs_re = cr * sa_re - ci * sa_im
    cs_im = cr * sa_im + ci * sa_re
    vr = tpl_re * cs_re - tpl_im * cs_im
    vi = tpl_re * cs_im + tpl_im * cs_re
    # select (not multiply): invalid slots may carry non-finite spectra
    m = mask_ref[:] > 0.5             # [T, 1]
    vr = jnp.where(m, vr, 0.0).astype(mm_dtype)
    vi = jnp.where(m, vi, 0.0).astype(mm_dtype)

    xb_re = (jnp.dot(vr, drr_ref[:], preferred_element_type=jnp.float32)
             + jnp.dot(vi, dir_ref[:], preferred_element_type=jnp.float32))
    xb_im = (jnp.dot(vr, dri_ref[:], preferred_element_type=jnp.float32)
             + jnp.dot(vi, dii_ref[:], preferred_element_type=jnp.float32))

    theta = jnp.asarray(-2.0 * np.pi * df, jnp.float32) * off_ref[:]  # [T,1]
    t_r = xb_re.shape[0]
    if phase_mode == "input":
        wb_re, wb_im = wbr_ref[:], wbi_ref[:]                  # [T, 128]
    else:
        wb_re, wb_im = _phase_b_table(theta, t_r, phase_mode)

    @pl.when(j == 0)
    def _init():
        out_re_ref[:] = jnp.zeros((t_r, f_base), jnp.float32)
        out_im_ref[:] = jnp.zeros((t_r, f_base), jnp.float32)

    for a in range(f_base // _BLOCK):
        sl = slice(a * _BLOCK, (a + 1) * _BLOCK)
        xr = xb_re[:, sl]
        xi = xb_im[:, sl]
        t_re = xr * wb_re - xi * wb_im
        t_im = xr * wb_im + xi * wb_re
        if a == 0:
            y_re, y_im = t_re, t_im            # e^{-i*0} == 1 exactly
        else:
            ta = theta * jnp.float32(_BLOCK * a)               # [T, 1]
            wa_re, wa_im = jnp.cos(ta), jnp.sin(ta)
            y_re = t_re * wa_re - t_im * wa_im
            y_im = t_re * wa_im + t_im * wa_re
        out_re_ref[:, sl] += y_re
        out_im_ref[:, sl] += y_im


def chain_placement_reduce_v3(spec_re, spec_im, att_sparse, comb_re, comb_im,
                              mask, tpl_idx, offsets, W, templates, D_r, D_i,
                              *, s2: int, df: float, n_templates: int,
                              out_tile: int = 256,
                              matmul_dtype=jnp.float32,
                              phase_mode: str = "table"):
    """Same contract as :func:`chain_placement_reduce` (channel-major rows,
    (shower, ray) fastest) — reorders to j-major internally (XLA fuses the
    transpose into the producers) and runs the flat-epilogue v3 kernel.
    Returns [R // s2, F_pad] (re, im); caller slices ``[:, :F_base]``.

    phase_mode selects how the 128-wide phase b-table is produced (see
    :func:`_phase_b_table`); 'input' computes it XLA-side and streams it
    in ([R, 128] x2 extra HBM reads, but the sincos can overlap other
    stages under XLA's scheduler).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, F_int = spec_re.shape
    F_base = D_r.shape[1]
    F_pad = -(-F_base // _BLOCK) * _BLOCK
    n_sparse = att_sparse.shape[1]
    G_out = R // s2
    assert G_out % out_tile == 0 or out_tile > G_out

    def _jmajor(x):
        # rows (g, j) with j fastest -> (j, g): one transpose XLA fuses
        return (x.reshape(G_out, s2, *x.shape[1:])
                .swapaxes(0, 1).reshape(R, *x.shape[1:]))

    def _pad(m):
        return jnp.pad(m, ((0, 0), (0, F_pad - F_base)))

    drr = _pad(jnp.real(D_r).astype(matmul_dtype))
    dri = _pad(jnp.imag(D_r).astype(matmul_dtype))
    dir_ = _pad(jnp.real(D_i).astype(matmul_dtype))
    dii = _pad(jnp.imag(D_i).astype(matmul_dtype))

    # VMEM working set: row inputs + 4 DFT matrices + xb/t/y temporaries
    # + the revisited out block
    def _vmem(t):
        return 4 * (2 * t * F_int + t * (n_sparse + n_templates + 4)
                    + 4 * F_int * F_pad + 2 * n_templates * F_int
                    + n_sparse * F_int + 4 * t * F_pad + 2 * t * F_pad)
    while out_tile > 1 and (_vmem(out_tile) > 14 * 2 ** 20
                            or G_out % out_tile):
        out_tile //= 2
    n_i = G_out // out_tile
    grid = (n_i, s2)

    tr = jnp.real(templates).astype(jnp.float32)
    ti = jnp.imag(templates).astype(jnp.float32)
    w32 = jnp.asarray(W, jnp.float32)
    onehot = (tpl_idx[:, None]
              == jnp.arange(n_templates)[None, :]).astype(jnp.float32)

    kernel = functools.partial(_chain_kernel_v3, df=float(df),
                               f_base=int(F_pad), mm_dtype=matmul_dtype,
                               phase_mode=phase_mode)
    row = lambda w: pl.BlockSpec((out_tile, w),
                                 lambda i, j: (j * n_i + i, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i, j: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((out_tile, F_pad), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    args = [_jmajor(spec_re), _jmajor(spec_im), _jmajor(att_sparse),
            _jmajor(comb_re.reshape(R, 1)), _jmajor(comb_im.reshape(R, 1)),
            _jmajor(mask.reshape(R, 1)), _jmajor(onehot),
            _jmajor(offsets.reshape(R, 1)),
            w32, tr, ti, drr, dri, dir_, dii]
    in_specs = [
        row(F_int), row(F_int), row(n_sparse),
        row(1), row(1), row(1), row(n_templates), row(1),
        full((n_sparse, F_int)),
        full((n_templates, F_int)), full((n_templates, F_int)),
        full((F_int, F_pad)), full((F_int, F_pad)),
        full((F_int, F_pad)), full((F_int, F_pad)),
    ]
    if phase_mode == "input":
        theta = (jnp.float32(-2.0 * np.pi * df)
                 * offsets.reshape(R, 1).astype(jnp.float32))
        tb = theta * jnp.arange(_BLOCK, dtype=jnp.float32)[None, :]
        args += [_jmajor(jnp.cos(tb)), _jmajor(jnp.sin(tb))]
        in_specs += [row(_BLOCK), row(_BLOCK)]
    return pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((G_out, F_pad), jnp.float32),
            jax.ShapeDtypeStruct((G_out, F_pad), jnp.float32),
        ),
    )(*args)


def placement_reduce(volt_re, volt_im, offsets, D_r, D_i, *, s2: int,
                     df: float, row_tile: int = 256,
                     matmul_dtype=jnp.float32):
    """chan_spec rows = sum over the s2-sized (shower, ray) blocks of
    (V @ D) * exp(-2 pi i f offset).

    volt_re/volt_im : [R, F_int] f32 (R divisible by row_tile; row order
        (out_row, s2) with the s2 axis fastest)
    offsets : [R] f32
    D_r, D_i : [F_int, F_base] complex (host numpy)
    Returns (out_re, out_im) with shape [R // s2, F_pad] where F_pad is
    F_base rounded up to a 128 multiple (caller slices; padded columns are
    exact zeros — see chain_placement_reduce).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, F_int = volt_re.shape
    F_base = D_r.shape[1]
    F_pad = -(-F_base // _BLOCK) * _BLOCK
    offsets = offsets.reshape(R, 1)
    assert R % row_tile == 0 and row_tile % s2 == 0
    # shrink the tile until the kernel's working set fits scoped VMEM
    # (~16 MB): row inputs + 4 DFT matrices + ~4 row_tile x F_pad f32
    # temporaries (Xb products / phase) + the output tile
    def _vmem(rt):
        # ~10 row_tile x F_pad temporaries measured from the Mosaic scoped
        # allocation report (16.66M at rt=256, F_int=257, F_base=1025)
        return 4 * (2 * rt * F_int + 4 * F_int * F_pad
                    + 10 * rt * F_pad + 2 * (rt // s2) * F_pad)
    while row_tile > s2 and _vmem(row_tile) > 14 * 2 ** 20 \
            and row_tile % 2 == 0 and (row_tile // 2) % s2 == 0 \
            and R % (row_tile // 2) == 0:
        row_tile //= 2
    grid = (R // row_tile,)
    out_tile = row_tile // s2

    def _pad(m):
        return jnp.pad(m, ((0, 0), (0, F_pad - F_base)))

    drr = _pad(jnp.real(D_r).astype(matmul_dtype))
    dri = _pad(jnp.imag(D_r).astype(matmul_dtype))
    dir_ = _pad(jnp.real(D_i).astype(matmul_dtype))
    dii = _pad(jnp.imag(D_i).astype(matmul_dtype))

    kernel = functools.partial(_kernel, s2=s2, df=float(df),
                               f_base=int(F_pad), mm_dtype=matmul_dtype)
    return pl.pallas_call(
        kernel,
        # interpreter mode off-TPU so the kernel is testable on the CPU host
        interpret=jax.default_backend() != "tpu",
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, F_int), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, F_int), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F_int, F_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F_int, F_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F_int, F_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F_int, F_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((out_tile, F_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_tile, F_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R // s2, F_pad), jnp.float32),
            jax.ShapeDtypeStruct((R // s2, F_pad), jnp.float32),
        ),
    )(volt_re, volt_im, offsets, drr, dri, dir_, dii)
