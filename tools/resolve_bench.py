"""Measure the device record-resolve decode on the corpus batch.

Device timing uses the bench.py methodology: K-chained fori loops in
one jit with a tiny scalar fetch; rate = (tK - t1)/(K-1) cancels the
tunnel's dispatch latency. The production host-flatten route is
measured in the same process for a chip-state-fair comparison.

Writes RESOLVE_BENCH_r05.json.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from snappy_tpu import native
from snappy_tpu.ops import resolve as R
from snappy_tpu.ops.pallas.decode import (
    _decode_flat_pallas_v2,
    flat_v2_permute,
)
from snappy_tpu.ops.pallas.resolve import _resolve_pallas

DATA = Path(__file__).resolve().parents[1] / "data"
CORPUS = [
    "html", "urls.10K", "fireworks.jpeg", "paper-100k.pdf", "html_x_4",
    "alice29.txt", "asyoulik.txt", "lcet10.txt", "plrabn12.txt",
    "geo.protodata", "kppkn.gtb",
]
BS = 1 << 16
D_PAD = 1 << 16
REC_CAP = 1 << 14


def corpus_batch(reps: int = 8):
    bodies, declens = [], []
    for name in CORPUS:
        raw = (DATA / name).read_bytes()
        for i in range(0, len(raw), BS):
            blk = raw[i : i + BS]
            comp = native.compress(blk)
            p = 0
            while comp[p] & 0x80:
                p += 1
            body = comp[p + 1 :]
            if len(body) > 512 * 128:
                continue
            bodies.append(body)
            declens.append(len(blk))
    bodies = bodies * reps
    declens = declens * reps
    n = len(bodies)
    stride = min(512 * 128, -(-max(len(b) for b in bodies) // 128) * 128)
    srcs = np.zeros((n, stride), np.uint8)
    for i, b in enumerate(bodies):
        srcs[i, : len(b)] = np.frombuffer(b, np.uint8)
    lens = np.array([len(b) for b in bodies], np.uint64)
    decl = np.array(declens, np.uint64)
    return srcs, lens, decl


def _time_it(fn, iters):
    fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def device_rate(run_k, iters=3, kbig=9):
    t1 = _time_it(lambda: int(run_k(jnp.int32(1))), iters)
    tk = _time_it(lambda: int(run_k(jnp.int32(kbig))), iters)
    return (tk - t1) / (kbig - 1)


def main():
    srcs, lens, decl = corpus_batch()
    n = len(lens)
    total = int(decl.sum())
    print(f"batch: {n} blocks, {total/1e6:.1f} MB decoded")

    for threads in (1, 4):
        t = []
        for _ in range(8):
            t0 = time.perf_counter()
            recs, nops, errs, dt = native.scan_records_batch(
                srcs, lens, decl, REC_CAP, threads=threads)
            t.append(time.perf_counter() - t0)
        if threads == 1:
            scan_1t = min(t)
    scan_s4 = min(t)
    print(f"host scan_records: 1t {scan_1t*1e3:.1f} ms, 4t {scan_s4*1e3:.1f} ms "
          f"({total/scan_s4/1e9:.2f} GB/s)")
    assert int(errs.sum()) == 0 and int(nops.max()) <= REC_CAP

    t = []
    for _ in range(5):
        t0 = time.perf_counter()
        idx_rel, tmeta, fbk, ferr, fdt = native.flatten_idx_batch(
            srcs, lens, decl, D_PAD, threads=4, layout=1)
        t.append(time.perf_counter() - t0)
    flat_s = min(t)
    print(f"host flatten 4t: {flat_s*1e3:.1f} ms ({total/flat_s/1e9:.2f} GB/s)")

    recs_d = jnp.asarray(recs)
    nops_d = jnp.asarray(nops)
    decl_d = jnp.asarray(decl.astype(np.int64))
    srcs_d = jnp.asarray(srcs)
    lens32 = jnp.asarray(decl.astype(np.int32))
    s_rows = srcs.shape[1] // 128

    # ---- production baseline in this process: v2 gather on host idx
    idxj = jnp.asarray(idx_rel)
    tmetaj = jnp.asarray(tmeta)

    @jax.jit
    def run_base(k):
        def body(i, acc):
            i2 = jnp.roll(idxj, i, axis=0)
            d2 = jnp.roll(lens32, i)
            dst = _decode_flat_pallas_v2(srcs_d, i2, tmetaj, d2, D_PAD, False)
            return acc + dst[:, ::4096].astype(jnp.int32).sum()
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    base_s = device_rate(run_base)
    print(f"baseline v2 gather (host idx): {base_s*1e3:.1f} ms "
          f"({base_s/n*1e6:.0f} us/blk, {total/base_s/1e9:.2f} GB/s)")

    # ---- full resolve pipeline
    def full(r, no, dc, dc32, s):
        a0_, rm_ = R.records_to_pointers(r, no, dc, D_PAD)
        a_ = _resolve_pallas(a0_, rm_, False)
        ip_, tm_, fb_ = R.idx_to_v2_inputs(a_, dc, D_PAD, s_rows)
        return _decode_flat_pallas_v2(s, ip_, tm_, dc32, D_PAD, False)

    @jax.jit
    def run_full(k):
        def body(i, acc):
            r2 = jnp.roll(recs_d, i, axis=0)
            no2 = jnp.roll(nops_d, i)
            dc2 = jnp.roll(decl_d, i)
            d232 = jnp.roll(lens32, i)
            s2 = jnp.roll(srcs_d, i, axis=0)
            dst = full(r2, no2, dc2, d232, s2)
            return acc + dst[:, ::4096].astype(jnp.int32).sum()
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    t0 = time.perf_counter()
    int(run_full(jnp.int32(1)))
    print(f"full compile: {time.perf_counter()-t0:.1f} s")
    full_s = device_rate(run_full)
    print(f"FULL resolve pipeline: {full_s*1e3:.1f} ms "
          f"({full_s/n*1e6:.0f} us/blk, {total/full_s/1e9:.3f} GB/s)")

    # ---- stage attribution (each its own chained loop)
    @jax.jit
    def run_s1(k):
        def body(i, acc):
            r2 = jnp.roll(recs_d, i, axis=0)
            a0_, rm_ = R.records_to_pointers(r2, nops_d, decl_d, D_PAD)
            return acc + a0_[:, ::4096].sum() + rm_[:, ::7].sum()
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    s1 = device_rate(run_s1)
    print(f"stage1 pointers: {s1*1e3:.1f} ms ({s1/n*1e6:.0f} us/blk)")

    a0_h, rm_h = jax.jit(
        lambda r, no, dc: R.records_to_pointers(r, no, dc, D_PAD)
    )(recs_d, nops_d, decl_d)
    a0_h = jax.block_until_ready(a0_h)
    rm_h = jax.block_until_ready(rm_h)

    @jax.jit
    def run_s2(k):
        def body(i, acc):
            a2 = jnp.roll(a0_h, i, axis=0)
            r2 = jnp.roll(rm_h, i, axis=0)
            a_ = _resolve_pallas(a2, r2, False)
            return acc + a_[:, ::4096].sum()
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    s2 = device_rate(run_s2)
    print(f"stage2 resolve kernel: {s2*1e3:.1f} ms ({s2/n*1e6:.0f} us/blk)")

    a_r = jax.block_until_ready(_resolve_pallas(a0_h, rm_h, False))

    @jax.jit
    def run_s3(k):
        def body(i, acc):
            a2 = jnp.roll(a_r, i, axis=0)
            ip_, tm_, fb_ = R.idx_to_v2_inputs(a2, decl_d, D_PAD, s_rows)
            return acc + ip_[:, ::4096].astype(jnp.int32).sum() + tm_[:, ::7].sum()
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    s3 = device_rate(run_s3)
    print(f"stage3 v2 inputs: {s3*1e3:.1f} ms ({s3/n*1e6:.0f} us/blk)")

    # correctness of the full jit once
    outf = jax.jit(lambda: full(recs_d, nops_d, decl_d, lens32, srcs_d))()
    outh = np.asarray(outf)
    import snappy_tpu.format.varint as V
    bad = 0
    for i in range(0, n, 13):
        d = int(decl[i])
        want = native.decompress(
            V.write_varu64(d) + srcs[i, : int(lens[i])].tobytes())
        if outh[i, :d].tobytes() != want:
            bad += 1
    print("sampled correctness: bad rows =", bad)

    res = {
        "batch_blocks": n,
        "decode_bytes": total,
        "host_scan_1t_s": round(scan_1t, 4),
        "host_scan_4t_s": round(scan_s4, 4),
        "host_scan_GBps_4t": round(total / scan_s4 / 1e9, 3),
        "host_flatten_4t_s": round(flat_s, 4),
        "baseline_v2_gather_s": round(base_s, 4),
        "baseline_v2_gather_GBps": round(total / base_s / 1e9, 4),
        "stage1_pointers_s": round(s1, 4),
        "stage2_resolve_s": round(s2, 4),
        "stage3_v2_inputs_s": round(s3, 4),
        "full_device_s": round(full_s, 4),
        "decode_resolve_device_GBps": round(total / full_s / 1e9, 4),
        "decode_resolve_e2e_serial_GBps": round(
            total / (scan_s4 + full_s) / 1e9, 4),
        "chips_fed_by_4core_host": round(full_s / scan_s4, 2),
        "bad_rows_sampled": bad,
    }
    print(json.dumps(res, indent=1))
    Path(__file__).resolve().parents[1].joinpath(
        "RESOLVE_BENCH_r05.json").write_text(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
