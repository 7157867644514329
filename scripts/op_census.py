"""Reduce-op census of the megakernel's lowered HLO (CPU-runnable).

Each jnp.sum/min/max/argmin/any over a (B, W) block inside the traversal
step is a `reduce` in the lowered module; on TPU every one of them is a
fusion break (its input materializes between fusions — docs/PERF_NOTES.md
"Round-3 op-level profile": ~160 us/iter VPU tail of ~100 small fusions).
This script counts them with RT2_NOREDUCE=0 vs 1 so the "~13 reduce breaks
per traversal step" figure cited in kernels/megakernel.py is reproducible:

    python scripts/op_census.py [scene]   # default obj_test (dragon)

The count is taken from the pre-optimization lowered module (platform-
independent); per-step attribution divides the whole-loop delta by the
unroll factor (reduces removed by RT2_NOREDUCE all sit inside the
unrolled traversal window; boundary/claim/log reduces are shared).
"""
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp


_RS_CACHE = {}


def count_reduces(scene_name: str, noreduce: str) -> dict:
    os.environ["RT2_NOREDUCE"] = noreduce
    jax.clear_caches()
    # import inside so the env var is read at trace time
    from ray_tracer_2_tpu.kernels.megakernel import render_persistent
    from ray_tracer_2_tpu.scene import scenes
    from ray_tracer_2_tpu.scene.render_scene import instantiate_scene

    if scene_name not in _RS_CACHE:  # scene build dominates; do it once
        _RS_CACHE[scene_name] = instantiate_scene(
            getattr(scenes, scene_name)()).render_scene
    rs = _RS_CACHE[scene_name]
    # lanes=256 keeps CPU lowering fast; the reduce COUNT is lane-invariant
    lowered = jax.jit(
        lambda s, f: render_persistent(s, f, width=128, height=72,
                                       bounces=5, rays_per_pixel=1,
                                       skybox=True, lanes=256)
    ).lower(rs, jnp.int32(0))
    txt = lowered.as_text()
    ops = re.findall(r"stablehlo\.(reduce|sort|iota)\b", txt)
    n_reduce = sum(1 for o in ops if o == "reduce")
    n_sort = sum(1 for o in ops if o == "sort")
    return {"reduce": n_reduce, "sort": n_sort}


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "obj_test"
    unroll = 5  # render_persistent's tuned default (megakernel.py)
    base = count_reduces(scene, "0")
    nored = count_reduces(scene, "1")
    delta = base["reduce"] - nored["reduce"]
    print(f"scene={scene}")
    print(f"RT2_NOREDUCE=0: reduce={base['reduce']} sort={base['sort']}")
    print(f"RT2_NOREDUCE=1: reduce={nored['reduce']} sort={nored['sort']}")
    print(f"delta={delta} (~{delta / unroll:.1f} per traversal step at "
          f"unroll={unroll})")


if __name__ == "__main__":
    main()
