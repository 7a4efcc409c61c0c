"""Measure the axon tunnel's raw H2D / D2H bandwidth and dispatch RTT.

The beyond-HBM streaming engine is staging-bound in this environment; this
probe attributes that to the tunnel's transfer rates (a locally-attached
v5e host moves H2D at PCIe/ICI speed, orders of magnitude faster). One JSON
line: H2D and D2H MB/s at two sizes plus the per-dispatch round trip.

Run: python benchmarks/tunnel_probe.py [mb]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    import jax
    import jax.numpy as jnp

    out = {"backend": jax.default_backend(),
           "device": str(jax.devices()[0])}

    # dispatch RTT: tiny data-dependent chain
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda a: a + 1)
    f(x).block_until_ready()
    t0 = time.perf_counter()
    y = x
    n = 20
    for _ in range(n):
        y = f(y)
    float(np.asarray(y)[0, 0])
    out["dispatch_rtt_ms"] = round((time.perf_counter() - t0) / n * 1e3, 1)

    for size_mb in (16, mb):
        a = np.random.default_rng(0).integers(
            0, 127, size=(size_mb << 20,), dtype=np.int8)
        # H2D: asarray + tiny dependent read so the copy must complete
        g = jax.jit(lambda v: v[::65536].astype(jnp.int32).sum())
        t0 = time.perf_counter()
        dev = jnp.asarray(a)
        int(np.asarray(g(dev)))
        dt = time.perf_counter() - t0
        out[f"h2d_{size_mb}mb_MBps"] = round(size_mb / dt, 1)
        # D2H: device-produced buffer read back whole
        dev2 = (dev + jnp.int8(1)).block_until_ready()
        t0 = time.perf_counter()
        _ = np.asarray(dev2)
        dt = time.perf_counter() - t0
        out[f"d2h_{size_mb}mb_MBps"] = round(size_mb / dt, 1)
        del dev, dev2

    print(json.dumps(out))


if __name__ == "__main__":
    main()
