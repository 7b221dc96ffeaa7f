#!/usr/bin/env python
"""Dump the compiled HLO of the inference forward and map hot fusion names
(from the profiler trace) to their root instructions; also re-test whether
the relay can compile a scanned BACKWARD graph (round-1 blocker)."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HOT = ["fusion.1002", "fusion.2795", "fusion.1327", "fusion.39",
       "add_maximum_fusion", "fusion.754", "fusion.509", "fusion.71",
       "copy.353"]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from shgvqa_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    mode = sys.argv[1] if len(sys.argv) > 1 else "hlo"

    if mode == "scan_bwd":
        # minimal scanned-backward repro: lax.scan over 3 dense layers,
        # value_and_grad, jit -- crashes the relay AOT helper in round 1
        import flax.linen as nn

        class Body(nn.Module):
            @nn.compact
            def __call__(self, x, _):
                return nn.Dense(64)(x), None

        scanned = nn.scan(Body, variable_axes={"params": 0},
                          split_rngs={"params": True}, length=3,
                          in_axes=(nn.broadcast,))

        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                y, _ = scanned(name="stack")(x, None)
                return jnp.sum(y ** 2)

        m = M()
        x = jnp.ones((8, 64))
        p = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        g = jax.jit(jax.grad(lambda pp, xx: m.apply(pp, xx)))(p, x)
        leaf = jax.tree_util.tree_leaves(g)[0]
        print("scan_bwd OK:", np.asarray(leaf).shape,
              float(jnp.abs(leaf).sum()))
        return

    from __graft_entry__ import _example_batch, _flagship_cfg
    from shgvqa_tpu.models.shgvqa import VideoShgVqaModel

    cfg = _flagship_cfg()
    model = VideoShgVqaModel(cfg)
    batch = _example_batch(cfg, batch_size=32, seed=0)
    batch["frames"] = (batch["frames"] * 255.0).astype(np.uint8)
    params = jax.jit(lambda r, b: model.init(r, b, deterministic=True))(
        jax.random.PRNGKey(0), _example_batch(cfg, batch_size=1, seed=0))

    @jax.jit
    def forward(params, batch):
        out = model.apply(params, batch, deterministic=True)
        return jnp.argmax(out["hg_logit"], axis=-1)

    txt = forward.lower(params, batch).compile().as_text()
    print(f"HLO text: {len(txt)} chars", file=sys.stderr)
    # index fusion computations: name -> called computation root line
    for name in HOT:
        # the fusion instruction line carries calls=<computation>
        m = re.search(
            rf"%?{re.escape(name)} = [^\n]+", txt)
        if not m:
            print(f"{name}: NOT FOUND")
            continue
        line = m.group(0)
        print(f"== {name}: {line[:300]}")
        cm = re.search(r"calls=([%\w.\-]+)", line)
        if cm:
            comp = cm.group(1).lstrip("%")
            cdef = re.search(
                rf"%?{re.escape(comp)} [^\n]*\{{(.*?)\n\}}", txt, re.S)
            if cdef:
                body = cdef.group(1)
                ops = re.findall(r"= (\w+)\(", body) or \
                    re.findall(r"= [\w\[\]{}0-9,]+ (\w+)\(", body)
                from collections import Counter
                print("   ops:", dict(Counter(
                    re.findall(r"= [^\s]+ ([\w\-]+)\(", body))))
                tail = body.strip().splitlines()[-1]
                print("   root:", tail.strip()[:280])


if __name__ == "__main__":
    main()
