"""Quick TPU-tunnel health probe: compile, compute, and d2h fetch.

The round-4 builder hit a tunnel state where compute and h2d worked but
any device->host fetch of computed data hung indefinitely (even 8 KB) —
which silently wedges every benchmark and the app. Run this before chip
measurements; exits 0 only when all three paths respond.

Usage: timeout 60 python tools/tunnel_health.py
"""

import time

import numpy as np


def main() -> int:
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()
    print(f"+{time.time()-t0:.1f}s devices {dev}", flush=True)
    k = jax.random.PRNGKey(0)
    y = jax.block_until_ready(jax.random.normal(k, (512, 128)))
    print(f"+{time.time()-t0:.1f}s compute ok", flush=True)
    h = jax.device_put(np.ones((512, 128), np.float32))
    jax.block_until_ready(h)
    print(f"+{time.time()-t0:.1f}s h2d ok", flush=True)
    t1 = time.time()
    a = np.asarray(y)
    print(f"+{time.time()-t0:.1f}s d2h ok ({256*1024/(time.time()-t1)/1e6:.1f}"
          f" MB/s)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
