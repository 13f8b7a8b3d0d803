"""Bisect which section of the fused frontend kernel crashes Mosaic."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import faulthandler
    faulthandler.dump_traceback_later(300, exit=True)
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from orb_slam3_detailed_comments_tpu.ops import pallas_frontend as pf

    which = sys.argv[1] if len(sys.argv) > 1 else "fast"
    H, W = 480, 752
    n = -(-H // pf.STRIP)
    T = pf.STRIP + 2 * pf.HALO
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(0, 255, (n * T, W)).astype(np.float32))

    def kern(img_ref, out_ref):
        f = img_ref[:].astype(jnp.float32)
        if which == "fast":
            out_ref[:] = pf._fast_section(f)
        elif which == "blur":
            out_ref[:] = pf._blur_section(f)
        elif which == "moments":
            m10, m01 = pf._moments_section(f)
            out_ref[:] = m10 + m01
        elif which == "copy":
            out_ref[:] = f[pf.HALO: pf.HALO + pf.STRIP]
        elif which == "mean":
            out_ref[:] = (f - jnp.mean(f))[pf.HALO: pf.HALO + pf.STRIP]
        elif which == "pad16":
            p = pf._pad_h_edge(f, 16)
            out_ref[:] = p[pf.HALO: pf.HALO + pf.STRIP, 16:16 + f.shape[1]]
        elif which == "wsum":
            from orb_slam3_detailed_comments_tpu.ops.brief import (_U_MAX,
                                                                   HALF_PATCH)
            widths = sorted({int(_U_MAX[abs(dv)])
                             for dv in range(-HALF_PATCH, HALF_PATCH + 1)})
            ws = pf._window_sums(pf._pad_h_edge(f, 16), widths,
                                 f.shape[1], 16)
            acc = None
            for w in widths:
                acc = ws[w] if acc is None else acc + ws[w]
            out_ref[:] = acc[pf.HALO: pf.HALO + pf.STRIP]
        elif which == "iota":
            xcol = jax.lax.broadcasted_iota(
                jnp.int32, f.shape, 1).astype(jnp.float32)
            out_ref[:] = (f * xcol)[pf.HALO: pf.HALO + pf.STRIP]
        elif which.startswith("mom_"):
            from orb_slam3_detailed_comments_tpu.ops.brief import (_U_MAX,
                                                                   HALF_PATCH)
            T_, W_ = f.shape
            S = T_ - 2 * pf.HALO
            imgc = f if which == "mom_nomean" else f - jnp.mean(f)
            xcol = jax.lax.broadcasted_iota(
                jnp.int32, (T_, W_), 1).astype(jnp.float32)
            ic = pf._pad_h_edge(imgc, pf._PAD)
            txp = pf._pad_h_edge(imgc * xcol, pf._PAD)
            widths = sorted({int(_U_MAX[abs(dv)])
                             for dv in range(-HALF_PATCH, HALF_PATCH + 1)})
            if which == "mom_few":
                widths = widths[:2]
            rs_all = pf._window_sums(ic, widths, W_, pf._PAD)
            ts_all = pf._window_sums(txp, widths, W_, pf._PAD)
            xci = xcol[pf.HALO: pf.HALO + S]
            m10 = jnp.zeros((S, W_), jnp.float32)
            m01 = jnp.zeros((S, W_), jnp.float32)
            R = HALF_PATCH
            for w in widths:
                rsw, tsw = rs_all[w], ts_all[w]
                for dv in range(-R, R + 1):
                    if int(_U_MAX[abs(dv)]) != w:
                        continue
                    rs = rsw[pf.HALO + dv: pf.HALO + dv + S]
                    ts = tsw[pf.HALO + dv: pf.HALO + dv + S]
                    if which == "mom_pre":
                        m10 = m10 + (tsw - xcol * rsw)[pf.HALO + dv:
                                                       pf.HALO + dv + S]
                    elif which != "mom_m01":
                        m10 = m10 + (ts - xci * rs)
                    if dv != 0 and which != "mom_m10":
                        m01 = m01 + float(dv) * rs
            out_ref[:] = m10 + m01

    shp = jax.ShapeDtypeStruct((n * pf.STRIP, W), jnp.float32)
    fn = pl.pallas_call(
        kern, grid=(n,),
        in_specs=[pl.BlockSpec((T, W), lambda s: (s, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((pf.STRIP, W), lambda s: (s, 0)),
        out_shape=shp,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=pf._VMEM_LIMIT))
    t0 = time.time()
    out = jax.block_until_ready(fn(x))
    print(f"{which}: ok, {time.time() - t0:.1f}s, sum={float(out.sum()):.1f}")


if __name__ == "__main__":
    main()
