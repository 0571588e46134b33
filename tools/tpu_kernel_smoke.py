"""On-device kernel verification (run on a real TPU chip).

Checks the hand-written Pallas kernels and quantized matmuls against
their jnp oracles on hardware — the CPU test suite exercises the oracle
paths, so this is the one place the TPU-only code paths get validated
numerically.

Usage: python tools/tpu_kernel_smoke.py
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def check(name, got, want, rtol, atol=1e-2):
    err = np.max(np.abs(np.asarray(got, np.float32) -
                        np.asarray(want, np.float32)))
    rel = err / (np.max(np.abs(want)) + 1e-9)
    ok = rel <= rtol or err <= atol
    print(f"{'PASS' if ok else 'FAIL'} {name}: max_err={err:.5f} "
          f"rel={rel:.5f}")
    return ok


def main() -> int:
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() in ("tpu", "axon"), (
        "run this on the TPU (plain `python`, no PYTHONPATH override)")
    ok = True
    rng = np.random.default_rng(0)

    # 1. Fused int4 dequant-matmul Pallas kernels vs reference.
    from aphrodite_tpu.ops.quant_matmul import (int4_matmul_pallas,
                                                int4_matmul_ref,
                                                int4p_matmul_pallas,
                                                unpack_int4_rows)
    from aphrodite_tpu.quantization.int4 import quantize_from_float

    K, N, T, G = 1024, 1024, 256, 128
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    c = quantize_from_float(w, group=G)
    x = rng.standard_normal((T, K)).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    q4p = jnp.asarray(c["q4p"])
    q4 = unpack_int4_rows(q4p)
    sc = jnp.asarray(c["scale"])
    z = jnp.asarray(c["zero"])
    got = jax.jit(lambda *a: int4_matmul_pallas(*a, group=G))(xb, q4, sc, z)
    want = int4_matmul_ref(jnp.asarray(x), q4, sc, z, G)
    ok &= check("int4_matmul_pallas", got, want, rtol=2e-2)

    # 1a. Packed (2 nibbles/byte) kernel, prefill body.
    got = jax.jit(lambda *a: int4p_matmul_pallas(*a, group=G))(
        xb, q4p, sc, z)
    ok &= check("int4p_matmul_prefill", got, want, rtol=2e-2)

    # 1b. Group-wise (decode) kernels vs reference.
    from aphrodite_tpu.ops.quant_matmul import int4_matmul_pallas_groupwise

    Td = 64
    xd = jnp.asarray(rng.standard_normal((Td, K)) * 0.3, jnp.bfloat16)
    got = jax.jit(lambda *a: int4_matmul_pallas_groupwise(*a, group=G))(
        xd, q4, sc, z)
    want = int4_matmul_ref(xd.astype(jnp.float32), q4, sc, z, G)
    ok &= check("int4_matmul_groupwise", got, want, rtol=2e-2)
    got = jax.jit(lambda *a: int4p_matmul_pallas(*a, group=G))(
        xd, q4p, sc, z)
    ok &= check("int4p_matmul_decode", got, want, rtol=2e-2)

    # 1b'. Wide-range grouped containers through the SAME kernels:
    # gguf q6_k-style (values 0..63, G=16, zero 32) and q8_0/iq-style
    # (signed int8, G=32, zero 0) — the unpacked path is value-range
    # agnostic; this pins that property on hardware.
    q6 = jnp.asarray(rng.integers(0, 64, size=(K, N)), jnp.int8)
    s6 = jnp.asarray(rng.random((K // 16, N)).astype(np.float32) * 0.02
                     + 1e-3)
    z6 = jnp.full((K // 16, N), 32.0, jnp.float32)
    got = jax.jit(lambda *a: int4_matmul_pallas_groupwise(*a, group=16))(
        xd, q6, s6, z6)
    want = int4_matmul_ref(xd.astype(jnp.float32), q6, s6, z6, 16)
    ok &= check("q6k_container_groupwise", got, want, rtol=2e-2)
    got = jax.jit(lambda *a: int4_matmul_pallas(*a, group=16))(
        xb, q6, s6, z6)
    want = int4_matmul_ref(jnp.asarray(x), q6, s6, z6, 16)
    ok &= check("q6k_container_dense", got, want, rtol=2e-2)

    qs8 = jnp.asarray(rng.integers(-127, 128, size=(K, N)), jnp.int8)
    s8 = jnp.asarray(rng.random((K // 32, N)).astype(np.float32) * 0.01
                     + 1e-3)
    z8 = jnp.zeros((K // 32, N), jnp.float32)
    got = jax.jit(lambda *a: int4_matmul_pallas_groupwise(*a, group=32))(
        xd, qs8, s8, z8)
    want = int4_matmul_ref(xd.astype(jnp.float32), qs8, s8, z8, 32)
    ok &= check("signed8_container_groupwise", got, want, rtol=2e-2)

    # 1c. Microbenchmark: dense bf16 vs int4 variants at decode shape.
    import time as _time

    Kb, Nb = 2048, 8192
    wb = rng.standard_normal((Kb, Nb)).astype(np.float32) * 0.05
    cb = quantize_from_float(wb, group=128)
    q4pb = jnp.asarray(cb["q4p"])
    q4b = unpack_int4_rows(q4pb)
    scb, zb = jnp.asarray(cb["scale"]), jnp.asarray(cb["zero"])
    wb_bf = jnp.asarray(wb, jnp.bfloat16)
    xb2 = jnp.asarray(rng.standard_normal((Td, Kb)) * 0.3, jnp.bfloat16)

    def timeit(f, *args):
        f(*args).block_until_ready()  # compile+warm
        t0 = _time.monotonic()
        for _ in range(20):
            r = f(*args)
        r.block_until_ready()
        return (_time.monotonic() - t0) / 20 * 1e6  # us

    t_dense = timeit(jax.jit(lambda a, b: jnp.dot(
        a, b, preferred_element_type=jnp.float32)), xb2, wb_bf)
    t_deq = timeit(jax.jit(lambda *a: int4_matmul_pallas(*a, group=128)),
                   xb2, q4b, scb, zb)
    t_grp = timeit(jax.jit(
        lambda *a: int4_matmul_pallas_groupwise(*a, group=128)),
        xb2, q4b, scb, zb)
    t_pck = timeit(jax.jit(lambda *a: int4p_matmul_pallas(*a, group=128)),
                   xb2, q4pb, scb, zb)
    print(f"INFO matmul T=64 K=2048 N=8192: dense_bf16={t_dense:.0f}us "
          f"int4_dequant={t_deq:.0f}us int4_groupwise={t_grp:.0f}us "
          f"int4_packed={t_pck:.0f}us")

    # 1d. W4A8 (int8-activation) packed kernel vs its exact oracle.
    from aphrodite_tpu.ops.quant_matmul import (int4p_matmul_w4a8_pallas,
                                                int4p_matmul_w4a8_ref)

    got = jax.jit(
        lambda *a: int4p_matmul_w4a8_pallas(*a, group=128))(
            xb2, q4pb, scb, zb)
    want = int4p_matmul_w4a8_ref(xb2, q4pb, scb, zb, 128)
    ok &= check("w4a8_packed_kernel", got, want, rtol=5e-3)
    t_a8 = timeit(jax.jit(
        lambda *a: int4p_matmul_w4a8_pallas(*a, group=128)),
        xb2, q4pb, scb, zb)
    print(f"INFO w4a8 T=64 K=2048 N=8192: {t_a8:.0f}us "
          f"(vs int4_packed {t_pck:.0f}us)")

    # 1e. Grouped decode kernel's CP stats mode (-1 sentinel + flash
    # partials) merges to the full kernel output.
    from aphrodite_tpu.ops.decode_attention import paged_decode_attention

    Sd2, QHd, KVd, Dd, PSd = 8, 8, 4, 128, 16
    q_cp = jnp.asarray(rng.standard_normal((Sd2, QHd, Dd)), jnp.bfloat16)
    pg_cp = jnp.asarray(rng.standard_normal((32, PSd, 2 * KVd, Dd)) * .3,
                        jnp.bfloat16)
    kvl_cp = jnp.asarray(rng.integers(1, 120, size=(Sd2,)), jnp.int32)
    pi_cp = np.zeros((Sd2, 8), np.int32)
    for i in range(Sd2):
        pi_cp[i] = rng.choice(31, size=8, replace=False)
    pi_cp = jnp.asarray(pi_cp)
    ns_cp = jnp.asarray([Sd2], jnp.int32)
    full = paged_decode_attention(q_cp, pg_cp, kvl_cp, pi_cp, ns_cp,
                                  sm_scale=Dd ** -0.5)
    lo_i = jnp.where(pi_cp < 16, pi_cp, -1)
    hi_i = jnp.where(pi_cp >= 16, pi_cp - 16, -1)
    a0, st0 = paged_decode_attention(q_cp, pg_cp[:16], kvl_cp, lo_i,
                                     ns_cp, sm_scale=Dd ** -0.5,
                                     return_stats=True)
    a1, st1 = paged_decode_attention(q_cp, pg_cp[16:], kvl_cp, hi_i,
                                     ns_cp, sm_scale=Dd ** -0.5,
                                     return_stats=True)
    m0, l0 = st0[..., 0:1], st0[..., 1:2]
    m1, l1 = st1[..., 0:1], st1[..., 1:2]
    m_star = jnp.maximum(m0, m1)
    w0, w1 = jnp.exp(m0 - m_star), jnp.exp(m1 - m_star)
    l_tot = w0 * l0 + w1 * l1
    merged = (w0 * a0 + w1 * a1) / jnp.where(l_tot == 0, 1.0, l_tot)
    ok &= check("cp_sharded_decode_merge", merged.astype(jnp.float32),
                full.astype(jnp.float32), rtol=3e-2, atol=3e-2)

    # 2. Ragged paged attention kernel vs jnp oracle (mixed batch).
    from aphrodite_tpu.ops.attention import (_kernel_attention,
                                             ref_ragged_paged_attention)

    S, pages_per_seq, page_size, KVH, QH, D = 4, 8, 16, 2, 8, 128
    num_pages = S * pages_per_seq + 1
    kv_pages = jnp.asarray(
        rng.standard_normal((num_pages, page_size, 2 * KVH, D)) * 0.3,
        jnp.bfloat16)
    q_lens = [17, 1, 5, 1]  # mixed prefill + decode
    kv_lens_list = [17, 40, 33, 9]
    T2 = sum(q_lens)
    Tpad = 32
    q = jnp.asarray(rng.standard_normal((Tpad, QH, D)) * 0.3, jnp.bfloat16)
    kv_lens = jnp.asarray(kv_lens_list, jnp.int32)
    page_indices = jnp.asarray(
        np.arange(S * pages_per_seq, dtype=np.int32).reshape(S, -1))
    cu = np.zeros(S + 1, np.int32)
    cu[1:] = np.cumsum(q_lens)
    cu_q_lens = jnp.asarray(cu)
    num_seqs = jnp.asarray([S], jnp.int32)
    kw = dict(sm_scale=0.125, sliding_window=None, soft_cap=None,
              k_scale=None, v_scale=None)
    got = jax.jit(lambda *a: _kernel_attention(*a, **kw))(
        q, kv_pages, kv_lens, page_indices, cu_q_lens, num_seqs)
    want = ref_ragged_paged_attention(q, kv_pages, kv_lens, page_indices,
                                      cu_q_lens, num_seqs, sm_scale=0.125)
    ok &= check("ragged_paged_attention_kernel",
                np.asarray(got)[:T2], np.asarray(want)[:T2], rtol=3e-2)

    # 2b. Quantized-KV attention (fp8-e5m2 cache) on device.
    kv_f8 = kv_pages.astype(jnp.float8_e5m2)
    got = jax.jit(lambda *a: _kernel_attention(*a, **kw))(
        q, kv_f8, kv_lens, page_indices, cu_q_lens, num_seqs)
    want = ref_ragged_paged_attention(q, kv_f8, kv_lens, page_indices,
                                      cu_q_lens, num_seqs, sm_scale=0.125)
    ok &= check("ragged_paged_attention_fp8kv",
                np.asarray(got)[:T2], np.asarray(want)[:T2], rtol=8e-2)

    # 2c. Grouped decode kernel vs oracle (pure-decode batch).
    from aphrodite_tpu.ops.decode_attention import paged_decode_attention

    Sd = 16
    kv_lens_d = np.zeros((Sd,), np.int32)
    pi_d = np.zeros((Sd, pages_per_seq), np.int32)
    perm = rng.permutation(num_pages - 1) + 1
    j = 0
    for i in range(Sd):
        kv_lens_d[i] = int(rng.integers(1, pages_per_seq * page_size))
        npg = -(-int(kv_lens_d[i]) // page_size)
        pi_d[i, :npg] = perm[(j + np.arange(npg)) % len(perm)]
        j += npg
    qd = jnp.asarray(rng.standard_normal((Sd, QH, D)) * 0.3, jnp.bfloat16)
    kvl_d = jnp.asarray(kv_lens_d)
    pi_dj = jnp.asarray(pi_d)
    cu_d = jnp.arange(Sd + 1, dtype=jnp.int32)
    ns_d = jnp.asarray([Sd], jnp.int32)
    slopes = jnp.asarray(rng.uniform(0.01, 0.5, QH), jnp.float32)
    for name, dkw in [
        ("decode_attention_kernel", {}),
        ("decode_attention_window", dict(sliding_window=30)),
        ("decode_attention_softcap", dict(soft_cap=30.0)),
        ("decode_attention_alibi", dict(alibi_slopes=slopes)),
    ]:
        got = jax.jit(functools.partial(
            paged_decode_attention, sm_scale=0.125, **dkw))(
                qd, kv_pages, kvl_d, pi_dj, ns_d)
        want = ref_ragged_paged_attention(
            qd, kv_pages, kvl_d, pi_dj, cu_d, ns_d, sm_scale=0.125, **dkw)
        ok &= check(name, np.asarray(got), np.asarray(want), rtol=3e-2)

    # 2d. Grouped decode kernel over QUANTIZED KV pages (int8/fp8):
    # raw 8-bit DMA + in-register convert (scales fold outside).
    for qname, qdt in [("int8", jnp.int8), ("e4m3", jnp.float8_e4m3fn),
                       ("e5m2", jnp.float8_e5m2)]:
        if qdt == jnp.int8:
            kv_q = jnp.clip(jnp.round(kv_pages.astype(jnp.float32) * 80),
                            -128, 127).astype(jnp.int8)
        else:
            kv_q = kv_pages.astype(qdt)
        got = jax.jit(functools.partial(
            paged_decode_attention, sm_scale=0.125))(
                qd, kv_q, kvl_d, pi_dj, ns_d)
        want = ref_ragged_paged_attention(
            qd, kv_q, kvl_d, pi_dj, cu_d, ns_d, sm_scale=0.125)
        ok &= check(f"decode_attention_{qname}_kv", np.asarray(got),
                    np.asarray(want), rtol=3e-2)
        t_q = timeit(jax.jit(functools.partial(
            paged_decode_attention, sm_scale=0.125)),
            qd, kv_q, kvl_d, pi_dj, ns_d)
        print(f"INFO decode {qname}-KV: {t_q:.0f}us/call (S={Sd})")

    # 3. fp8 W8A8 matmul on device.
    from aphrodite_tpu.quantization import fp8
    from aphrodite_tpu.quantization.qlinear import qmatmul

    w2 = rng.standard_normal((512, 512)).astype(np.float32) * 0.05
    c2 = jax.tree.map(jnp.asarray, fp8.quantize_from_float(w2))
    x2 = rng.standard_normal((64, 512)).astype(np.float32)
    got = jax.jit(qmatmul)(jnp.asarray(x2), c2)
    ok &= check("fp8_w8a8_matmul", got, x2 @ w2, rtol=5e-2)

    # 4. In-graph sampler with a stack of advanced stages.
    import jax.numpy as jnp

    from aphrodite_tpu.common.sampling_params import SamplingParams
    from aphrodite_tpu.sampling.metadata import (SamplerInputRow,
                                                 build_sampling_tensors)
    from aphrodite_tpu.sampling.sampler import sample

    V = 32000
    logits = jnp.asarray(rng.standard_normal((8, V)), jnp.float32)
    rows = [
        SamplerInputRow(
            params=SamplingParams(temperature=0.8, top_p=0.9, top_k=40,
                                  min_p=0.02, tfs=0.95,
                                  repetition_penalty=1.1,
                                  dry_multiplier=0.5, seed=i),
            token_ids=list(range(50)), prompt_len=40, generated_len=10,
            seed=i) for i in range(8)
    ]
    t, flags, history, hl = build_sampling_tensors(rows, 8, V,
                                                   history_pad=128)
    out = jax.jit(lambda lg, tt, h, hlens, plens: sample(
        lg, tt, flags, h, hlens, plens))(
            logits, jax.tree.map(jnp.asarray, t), jnp.asarray(history),
            jnp.asarray(hl[0]), jnp.asarray(hl[1]))
    sampled = np.asarray(out.sampled)
    in_range = ((sampled >= 0) & (sampled < V)).all()
    finite = np.isfinite(np.asarray(out.sampled_logprob)).all()
    print(f"{'PASS' if in_range and finite else 'FAIL'} sampler_advanced: "
          f"tokens={sampled.tolist()}")
    ok &= bool(in_range and finite)

    # ---- ALiBi ragged kernel fork (ops/rpa_alibi_kernel.py) ----------
    from aphrodite_tpu.ops.attention import ref_ragged_paged_attention
    from aphrodite_tpu.ops.rpa_alibi_kernel import (
        ragged_paged_attention_alibi)

    rng = np.random.default_rng(11)
    for name, (T, Hq, Hkv, D) in {
            "alibi_rpa": (24, 4, 2, 128),
            # 16 q heads / 8 kv heads splits into 2 heads blocks —
            # exercises the per-block slopes BlockSpec (interpret mode
            # cannot run multi-heads-block grids; hardware-only).
            "alibi_rpa_multiblk": (16, 16, 8, 128)}.items():
        PS, pps, S = 16, 6, 2
        q = jnp.asarray(rng.standard_normal((T, Hq, D)),
                        jnp.bfloat16) * 0.3
        kvp = jnp.asarray(
            rng.standard_normal((S * pps + 2, PS, 2 * Hkv, D)),
            jnp.bfloat16) * 0.3
        kvl = jnp.asarray([20, 33], np.int32)
        pi = jnp.arange(S * pps, dtype=jnp.int32).reshape(S, pps)
        cuq = jnp.asarray([0, T // 2, T], np.int32)
        nsq = jnp.asarray([S], np.int32)
        sl = jnp.asarray(0.5 ** np.arange(1, Hq + 1), jnp.float32)
        got = ragged_paged_attention_alibi(
            q, kvp, kvl, pi, cuq, nsq, sl, sm_scale=0.25,
            num_kv_pages_per_block=2, num_queries_per_block=8)
        want = ref_ragged_paged_attention(
            q, kvp, kvl, pi, cuq, nsq, sm_scale=0.25, alibi_slopes=sl)
        ok &= check(name, np.asarray(got, np.float32),
                    np.asarray(want, np.float32), rtol=2e-2)

    # Fork as the fast-fp8 prefill kernel (bit-placement conversion,
    # no alibi bias): compiled-on-hardware check.
    T, Hq, Hkv, D = 24, 4, 2, 128
    PS, pps, S = 16, 6, 2
    q = jnp.asarray(rng.standard_normal((T, Hq, D)), jnp.bfloat16) * 0.3
    kvl = jnp.asarray([20, 33], np.int32)
    pi = jnp.arange(S * pps, dtype=jnp.int32).reshape(S, pps)
    cuq = jnp.asarray([0, T // 2, T], np.int32)
    nsq = jnp.asarray([S], np.int32)
    for fp8_name, fp8_dt in (("e4m3", jnp.float8_e4m3fn),
                             ("e5m2", jnp.float8_e5m2)):
        kvp8 = (jnp.asarray(
            rng.standard_normal((S * pps + 2, PS, 2 * Hkv, D)),
            jnp.float32) * 0.3).astype(fp8_dt)
        got = ragged_paged_attention_alibi(
            q, kvp8, kvl, pi, cuq, nsq, None, sm_scale=0.25,
            num_kv_pages_per_block=2, num_queries_per_block=8)
        want = ref_ragged_paged_attention(
            q, kvp8, kvl, pi, cuq, nsq, sm_scale=0.25)
        ok &= check(f"fork_fp8_prefill_{fp8_name}",
                    np.asarray(got, np.float32),
                    np.asarray(want, np.float32), rtol=3e-2)

    print("ALL PASS" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
