"""A/B: flat-v2 gather with value-built one-hots (no oh/sel scratch).

The production v2 kernel assembles the (1024, w) one-hot and the
(1024, 128) lane-select in VMEM scratches (8 piece writes + 1 read
each). This variant builds them as concatenated VALUES, trading
scratch traffic for register pressure.
"""
import sys, time
from pathlib import Path
import numpy as np
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))
import jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from snappy_tpu.ops.pallas.decode import (
    LANES, _flat_fiota, _flat_ind, _round128)

def make_kernel(s_rows, d_rows, arms=3):
    n_tiles = d_rows // 8
    n_groups = d_rows // 128
    _r128 = _round128
    widths = [_r128(min(w, s_rows)) for w in (128, 256, 512)[:arms]]
    s_scr = max(s_rows, widths[-1])

    def kernel(meta_ref, declen_ref, src_ref, idx_ref, dst_ref, srcw_ref,
               outt_ref):
        i = pl.program_id(0)
        declen = declen_ref[i]
        srcw_ref[pl.ds(0, s_rows), :] = src_ref[0].astype(jnp.int32)
        if s_scr > s_rows:
            srcw_ref[pl.ds(s_rows, s_scr - s_rows), :] = jnp.zeros(
                (s_scr - s_rows, LANES), jnp.int32)
        fiota, ind = _flat_fiota, _flat_ind
        lane2f = fiota((128, LANES), 1)
        ident = ind(fiota((128, 128), 0), fiota((128, 128), 1)).astype(
            jnp.bfloat16)

        def tile_into(blk, tt, base, w):
            ohs = []
            sels = []
            for s in range(8):
                col = blk[:, tt * 8 + s : tt * 8 + s + 1].astype(jnp.float32)
                row_em = jnp.floor(col * (1.0 / LANES))
                lane_em = col - row_em * LANES
                ohs.append(ind(fiota((128, w), 1), row_em).astype(jnp.bfloat16))
                sels.append(ind(lane2f, lane_em).astype(jnp.bfloat16))
            oh = jnp.concatenate(ohs, axis=0)
            sel = jnp.concatenate(sels, axis=0)
            win = srcw_ref[pl.ds(base, w), :]
            routed = jax.lax.dot_general(
                oh, win.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            vals = jnp.sum(routed * sel.astype(jnp.float32), axis=1,
                           keepdims=True)
            for s in range(8):
                outt_ref[:, tt * 8 + s : tt * 8 + s + 1] = vals[
                    s * 128 : (s + 1) * 128, :]

        n_active = (declen + 16383) // 16384

        def group(g, acc):
            def live_group(_):
                blk = idx_ref[0, pl.ds(g * 128, 128), :].astype(jnp.int32)
                for tt in range(16):
                    t = g * 16 + tt
                    base = meta_ref[i * n_tiles * 2 + 2 * t]
                    bucket = meta_ref[i * n_tiles * 2 + 2 * t + 1]
                    def mk(w):
                        def f(_):
                            tile_into(blk, tt, base, w)
                            return 0
                        return f
                    jax.lax.switch(bucket, [mk(w) for w in widths], None)
                return 0
            def dead_group(_):
                outt_ref[:] = jnp.zeros((128, 128), jnp.float32)
                return 0
            jax.lax.cond(g < n_active, live_group, dead_group, None)
            t_out = jax.lax.dot_general(
                outt_ref[:].astype(jnp.bfloat16), ident,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            pos = (g * (128 * LANES)
                   + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 0) * LANES
                   + jax.lax.broadcasted_iota(jnp.int32, (128, LANES), 1))
            dst_ref[0, pl.ds(g * 128, 128), :] = jnp.where(
                pos < declen, t_out.astype(jnp.int32), 0).astype(jnp.uint8)
            return acc
        jax.lax.fori_loop(0, n_groups, group, jnp.int32(0))
    return kernel

@partial(jax.jit, static_argnames=("d_pad",))
def decode_v2_values(srcs, idx_phys, tile_meta, declens, d_pad):
    idx_phys = idx_phys.astype(jnp.uint16)
    b, s = srcs.shape
    s_rows, d_rows = s // LANES, d_pad // LANES
    n_tiles = d_rows // 8
    kernel = make_kernel(s_rows, d_rows)
    widths = [_round128(min(w, s_rows)) for w in (128, 256, 512)]
    s_scr = max(s_rows, widths[-1])
    dst = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, s_rows, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d_rows, LANES), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d_rows, LANES), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((s_scr, LANES), jnp.int32),
            pltpu.VMEM((128, 128), jnp.float32),
        ],
        interpret=False,
    )(
        tile_meta.reshape(b * n_tiles * 2),
        declens.astype(jnp.int32),
        srcs.reshape(b, s_rows, LANES),
        idx_phys.reshape(b, d_rows, LANES),
    )
    return dst.reshape(b, d_pad)

def main():
    from resolve_bench import corpus_batch, device_rate, D_PAD
    from snappy_tpu import native
    from snappy_tpu.ops.pallas.decode import _decode_flat_pallas_v2
    srcs, lens, decl = corpus_batch()
    n = len(lens)
    total = int(decl.sum())
    idxp, tmeta, fb, errs, dt = native.flatten_idx_batch(
        srcs, lens, decl, D_PAD, threads=4, layout=1)
    srcs_d = jnp.asarray(srcs); idx_d = jnp.asarray(idxp)
    tm_d = jnp.asarray(tmeta); dl_d = jnp.asarray(decl.astype(np.int32))

    want = np.asarray(_decode_flat_pallas_v2(srcs_d, idx_d, tm_d, dl_d, D_PAD, False))
    got = np.asarray(decode_v2_values(srcs_d, idx_d, tm_d, dl_d, D_PAD))
    print("exact:", (got == want).all())

    @jax.jit
    def run_base(k):
        def body(i, acc):
            d2 = jnp.roll(dl_d, i)
            dst = _decode_flat_pallas_v2(srcs_d, idx_d, tm_d, d2, D_PAD, False)
            return acc + dst[:, ::4096].astype(jnp.int32).sum()
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))
    @jax.jit
    def run_val(k):
        def body(i, acc):
            d2 = jnp.roll(dl_d, i)
            dst = decode_v2_values(srcs_d, idx_d, tm_d, d2, D_PAD)
            return acc + dst[:, ::4096].astype(jnp.int32).sum()
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))
    tb = device_rate(run_base)
    tv = device_rate(run_val)
    print(f"prod scratch: {tb*1e3:.1f} ms ({total/tb/1e9:.3f} GB/s)")
    print(f"value-built : {tv*1e3:.1f} ms ({total/tv/1e9:.3f} GB/s)")

if __name__ == "__main__":
    main()
