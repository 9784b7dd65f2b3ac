"""Which microbatch split keeps gradient accumulation sharding-local?

Under GSPMD the train step sees the GLOBAL batch, block-sharded on axis 0
over the data mesh (chip k holds rows [k*b, (k+1)*b)). Splitting that batch
into accumulation microbatches can be done two ways:

  contig:       micro = x.reshape(ACC, B//ACC, ...)          # halves
  interleaved:  micro = moveaxis(x.reshape(B//ACC, ACC, ...), 1, 0)

The contiguous split puts microbatch 0 entirely on the first half of the
chips, so XLA must materialize the other half's rows everywhere. The
interleaved split sends each chip's own rows to every microbatch, which is
a sharding-local reshape whenever accum_steps divides the per-chip batch.

Measured on an 8-device CPU mesh (B=16, ACC=2, toy matmul loss), counting
collectives in the optimized HLO:

    contig       {'all-to-all': 0, 'collective-permute': 0,
                  'all-gather': 3, 'all-reduce': 3}
    interleaved  {'all-to-all': 0, 'collective-permute': 0,
                  'all-gather': 0, 'all-reduce': 3}

The 3 all-gathers in the contiguous form are the batch being replicated to
every chip (at flagship shapes that is the full uint8 image stack per
step); the 3 all-reduces common to both are the expected gradient
reductions. train/step.py therefore uses the interleaved split.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python \
     docs/experiments/accum_split_sharding.py
"""
import re

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
B, ACC = 2 * len(jax.devices()), 2
x_sh = NamedSharding(mesh, P("data"))
w_sh = NamedSharding(mesh, P())


def loss(w, mb):
    return jnp.sum(jnp.tanh(mb @ w) ** 2)


def make_step(split):
    def step(w, x):
        if split == "contig":
            micro = x.reshape(ACC, B // ACC, -1)
        else:
            micro = jnp.moveaxis(x.reshape(B // ACC, ACC, -1), 1, 0)

        def body(g, mb):
            return g + jax.grad(loss)(w, mb), None

        g, _ = jax.lax.scan(body, jnp.zeros_like(w), micro)
        return g

    return step


if __name__ == "__main__":
    x = jax.device_put(jnp.ones((B, 4096)), x_sh)
    w = jax.device_put(jnp.ones((4096, 512)), w_sh)
    for split in ("contig", "interleaved"):
        hlo = (jax.jit(make_step(split), in_shardings=(w_sh, x_sh))
               .lower(w, x).compile().as_text())
        colls = {op: len(re.findall(op, hlo)) for op in
                 ("all-to-all", "collective-permute", "all-gather",
                  "all-reduce")}
        print(split, colls)
