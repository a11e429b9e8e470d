#!/usr/bin/env python
"""Fused-SSIM micro-benchmark + value-agreement check (the analogue of
submodules/fused-ssim/tests/{test.py,genplot.py}).

    python -m skelsplat_tpu.tools.bench_ssim [--shape 5 1 1080 1920]
"""

import argparse
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=4, default=[5, 1, 1080, 1920])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from skelsplat_tpu.ops import ssim as S

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random(args.shape).astype(np.float32))
    b = jnp.asarray(rng.random(args.shape).astype(np.float32))

    plain = jax.jit(lambda x, y: S.ssim(x, y))
    fused = jax.jit(lambda x, y: S.fused_ssim(x, y))
    grad = jax.jit(jax.grad(lambda x, y: S.fused_ssim(x, y)))

    v1, v2 = float(plain(a, b)), float(fused(a, b))
    print(f"value agreement: plain {v1:.6f} fused {v2:.6f} "
          f"diff {abs(v1 - v2):.2e}")
    for f, name in [(plain, "plain"), (fused, "fused"), (grad, "fused grad")]:
        jax.block_until_ready(f(a, b))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = f(a, b)
        jax.block_until_ready(r)
        print(f"{name}: {(time.perf_counter() - t0) / args.iters * 1000:.2f}"
              " ms")


if __name__ == "__main__":
    main()
