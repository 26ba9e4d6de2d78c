"""GMFlow component profiler: backbone / transformer / refine-loop local
correlation / full model, timed as data-dependent jitted chains (repeated
identical calls are memoized by the axon tunnel). Round-3 finding: the
refine-loop local correlation was 77 ms/call x 6 iterations = the entire
463 ms model cost at 864x480, fixed by the patch-gather reformulation in
models/unimatch/gmflow.py (local_correlation_with_flow docstring)."""
import sys, time, functools
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
import flax.linen as nn
from gflow_tpu.models.unimatch.gmflow import (GMFlow, GMFlowConfig, CNNEncoder,
    FeatureTransformer, local_correlation_with_flow, BasicUpdateBlock,
    upsample_flow_with_mask)

H, W = 480, 864
cfg = GMFlowConfig()
rng = np.random.default_rng(1)
img0 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
img1 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)

def timed(name, init_fn, apply_fn, *args):
    params = jax.jit(init_fn)(jax.random.PRNGKey(0), *args)
    jax.block_until_ready(params)
    f = jax.jit(apply_fn)
    o = f(params, *args); jax.block_until_ready(o)
    # chain to defeat memoization
    @jax.jit
    def chain(p, e):
        def body(i, e):
            outs = apply_fn(p, *[a + e*1e-6 for a in args])
            return jnp.mean(jax.tree.leaves(outs)[0])
        return jax.lax.fori_loop(0, 4, body, e)
    chain(params, jnp.float32(0.)).block_until_ready()
    t0 = time.perf_counter()
    chain(params, jnp.float32(1.)).block_until_ready()
    print(f"{name:28s} {(time.perf_counter()-t0)/4*1e3:9.2f} ms", flush=True)

# backbone
enc = CNNEncoder(cfg.feature_channels, cfg.num_scales)
timed("backbone (both images)",
      lambda k, a, b: enc.init(k, a),
      lambda p, a, b: [enc.apply(p, a), enc.apply(p, b)], img0, img1)

# transformer at 1/8 scale (splits=2)
f8 = jnp.asarray(rng.uniform(-1, 1, (1, H//8, W//8, 128)), jnp.float32)
tr = FeatureTransformer(128, cfg.num_transformer_layers)
timed("transformer 1/8 (splits 2)",
      lambda k, a, b: tr.init(k, a, b, 2),
      lambda p, a, b: tr.apply(p, a, b, 2), f8, f8 + 0.1)

# transformer at 1/4 scale (splits=8)
f4 = jnp.asarray(rng.uniform(-1, 1, (1, H//4, W//4, 128)), jnp.float32)
timed("transformer 1/4 (splits 8)",
      lambda k, a, b: tr.init(k, a, b, 8),
      lambda p, a, b: tr.apply(p, a, b, 8), f4, f4 + 0.1)

# local corr with flow at 1/4 (the refine-loop corr)
flow4 = jnp.zeros((1, H//4, W//4, 2))
t0c = None
def corr_apply(p, a, b, fl):
    return local_correlation_with_flow(a, b, fl, radius=4)
f = jax.jit(corr_apply)
o = f(None, f4, f4, flow4); jax.block_until_ready(o)
@jax.jit
def chain(e):
    def body(i, e):
        return jnp.mean(local_correlation_with_flow(f4 + e*1e-6, f4, flow4, 4))
    return jax.lax.fori_loop(0, 4, body, e)
chain(jnp.float32(0.)).block_until_ready()
t0 = time.perf_counter(); chain(jnp.float32(1.)).block_until_ready()
print(f"{'local_corr r=4 @1/4 (x1)':28s} {(time.perf_counter()-t0)/4*1e3:9.2f} ms", flush=True)

# full model for reference
model = GMFlow(cfg)
timed("FULL model", lambda k,a,b: model.init(k,a,b),
      lambda p,a,b: model.apply(p,a,b), img0, img1)
