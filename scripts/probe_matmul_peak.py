"""Measure the chip's ACTUAL matmul throughput ceilings (roofline anchors).

The r1 roofline assumed v5e "f32 peak = bf16 peak / 4 ~= 49 TFLOP/s" by a
hand count; VERDICT r4 item 1 asks for measured denominators instead.  This
probes, on the real chip, tanh-separated matmul chains (tanh defeats XLA's
algebraic folding of pure linear chains AND models the MLP pipeline's real
layer structure; its FLOPs are <1% of the matmul's at every shape here):

  - big square matmuls, f32 inputs, default precision (bf16 passes)
  - same, matmul_precision="highest" (true-f32 passes)
  - same, bf16 inputs
  - width-{64,128,256,512}-shaped chains (WxW @ WxB): the PINN pipeline's
    matmul shapes at batch 32768

Prints one JSON line per config to stdout.
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/neuralpde_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def time_matmul(m, k, n, dtype, precision=None, reps=50):
    """TFLOP/s of a `reps`-long dependent chain of tanh((m,k)@(k,n))."""
    kx, kw = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (k, n), dtype)
    w = jax.random.normal(kw, (m, k), dtype) / jnp.sqrt(float(k)).astype(dtype)

    def many(x, w):
        def body(c, _):
            y = jax.lax.dot_general(
                w, c, (((1,), (0,)), ((), ())), precision=precision)
            return jnp.tanh(y), ()
        y, _ = jax.lax.scan(body, x, None, length=reps)
        # reduce to a scalar: on the remote-TPU tunnel, block_until_ready on
        # a large device array does NOT wait for execution — only a value
        # transfer (float()) reliably synchronizes (bench.py pattern)
        return jnp.sum(y)

    jm = jax.jit(many)
    float(jm(x, w))
    t0 = time.perf_counter()
    float(jm(x, w))
    dt = time.perf_counter() - t0
    flops = 2.0 * m * k * n * reps
    return flops / dt / 1e12, dt


def main():
    for name, dtype, prec, shape, reps in [
        ("f32_default_4096", jnp.float32, None, (4096, 4096, 4096), 50),
        ("f32_highest_4096", jnp.float32, "highest", (4096, 4096, 4096), 50),
        ("bf16_4096", jnp.bfloat16, None, (4096, 4096, 4096), 50),
        ("f32_default_8192", jnp.float32, None, (8192, 8192, 8192), 20),
        ("w64_chain_default", jnp.float32, None, (64, 64, 32768), 400),
        ("w64_chain_highest", jnp.float32, "highest", (64, 64, 32768), 400),
        ("w128_chain_default", jnp.float32, None, (128, 128, 32768), 400),
        ("w128_chain_highest", jnp.float32, "highest", (128, 128, 32768), 400),
        ("w256_chain_default", jnp.float32, None, (256, 256, 32768), 200),
        ("w512_chain_default", jnp.float32, None, (512, 512, 32768), 200),
        ("w64_b524288_default", jnp.float32, None, (64, 64, 524288), 50),
        ("w128_b524288_default", jnp.float32, None, (128, 128, 524288), 50),
    ]:
        m, k, n = shape
        tflops, dt = time_matmul(m, k, n, dtype, prec, reps=reps)
        print(json.dumps({"config": name, "tflops": round(tflops, 2),
                          "secs": round(dt, 4)}), flush=True)


if __name__ == "__main__":
    main()
