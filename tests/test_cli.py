"""Headless render CLI (python -m ray_tracer_2_tpu): progressive render to
PNG with bit-exact checkpoint/resume (the reference's KeyP export flow,
app.rs:341-465, as a batch command)."""
import dataclasses

import numpy as np
import PIL.Image
import pytest

from ray_tracer_2_tpu.__main__ import main as cli_main
from ray_tracer_2_tpu.config import RenderParams
from ray_tracer_2_tpu.engine.export import framebuffer_to_srgb
from ray_tracer_2_tpu.engine.renderer import Renderer
from ray_tracer_2_tpu.scene import scenes
from ray_tracer_2_tpu.scene.render_scene import instantiate_scene

W, H, SPP = 64, 36, 6


def _reference_png(spp):
    host = instantiate_scene(scenes.metal())
    p = RenderParams(width=W, height=H, bounces=3, rays_per_pixel=1,
                     skybox=True)
    r = Renderer()
    for f in range(spp):
        fb = r.render(host.render_scene, dataclasses.replace(p, frames=f))
    return framebuffer_to_srgb(np.asarray(fb))


def test_cli_render_and_bitexact_resume(tmp_path):
    out = tmp_path / "a.png"
    ck = tmp_path / "a.ckpt.npz"
    # phase 1: 3 frames, checkpointed
    rc = cli_main(["--scene", "metal", "--spp", "3", "--width", str(W),
                   "--height", str(H), "--bounces", "3", "-o", str(out),
                   "--checkpoint", str(ck), "--log-every", "0"])
    assert rc == 0 and out.exists() and ck.exists()
    # phase 2: resume to SPP total
    rc = cli_main(["--scene", "metal", "--spp", str(SPP), "--width", str(W),
                   "--height", str(H), "--bounces", "3", "-o", str(out),
                   "--checkpoint", str(ck), "--resume", "--log-every", "0"])
    assert rc == 0
    got = np.asarray(PIL.Image.open(out))
    want = _reference_png(SPP)
    np.testing.assert_array_equal(got, want)


def test_cli_resume_rejects_mismatched_resolution(tmp_path):
    out = tmp_path / "b.png"
    ck = tmp_path / "b.ckpt.npz"
    assert cli_main(["--scene", "metal", "--spp", "2", "--width", str(W),
                     "--height", str(H), "--bounces", "2", "-o", str(out),
                     "--checkpoint", str(ck), "--log-every", "0"]) == 0
    rc = cli_main(["--scene", "metal", "--spp", "4", "--width", "32",
                   "--height", "18", "--bounces", "2", "-o", str(out),
                   "--checkpoint", str(ck), "--resume", "--log-every", "0"])
    assert rc == 2


def test_cli_unknown_scene_errors():
    with pytest.raises(SystemExit):
        cli_main(["--scene", "nope", "--spp", "1"])


def test_cli_resume_rejects_mismatched_estimator(tmp_path):
    """Resuming with different physics flags would blend two estimators
    into one accumulation — must refuse (review finding)."""
    out = tmp_path / "c.png"
    ck = tmp_path / "c.ckpt.npz"
    assert cli_main(["--scene", "metal", "--spp", "2", "--width", str(W),
                     "--height", str(H), "--bounces", "2", "-o", str(out),
                     "--checkpoint", str(ck), "--log-every", "0"]) == 0
    for extra in (["--bounces", "3"], ["--bounces", "2", "--antialias"],
                  ["--bounces", "2", "--rpp", "2"]):
        rc = cli_main(["--scene", "metal", "--spp", "4", "--width", str(W),
                       "--height", str(H), "-o", str(out),
                       "--checkpoint", str(ck), "--resume",
                       "--log-every", "0", *extra])
        assert rc == 2, extra
