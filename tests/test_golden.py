"""Golden-frame regression harness (SURVEY.md section 4).

The reference's quality gate is a human looking at the sample app
("If you see some shapes ... you're good to go", main.cpp:421-423);
here the same scene renders under a pinned config and must stay within
SSIM >= 0.98 of the checked-in golden frame. Regenerate intentionally
with:  python -m tests.test_golden --regen
"""

import os
import sys

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _render_golden_frame():
    from rt64tpu.utils.testscenes import build_sample_scene, hud_triangle

    dev, scene, view = build_sample_scene(width=160, height=120)
    hud_triangle(scene, dev, color=(1.0, 0.15, 0.1, 0.85))
    # Two frames so temporal accumulation has state.
    dev.draw()
    dev.draw()
    return view.framebuffer()[..., :3]


def test_golden_sample_frame():
    from rt64tpu.utils.assets import read_image
    from rt64tpu.utils.ssim import ssim

    path = os.path.join(GOLDEN_DIR, "sample_160x120.png")
    assert os.path.exists(path), "golden missing; run python -m tests.test_golden --regen"
    golden = read_image(path)[..., :3]
    frame = _render_golden_frame()
    score = ssim(frame, golden)
    assert score >= 0.98, f"SSIM {score:.4f} < 0.98 vs golden"


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    if "--regen" in sys.argv:
        from rt64tpu.utils.assets import write_png

        frame = _render_golden_frame()
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        out = os.path.join(GOLDEN_DIR, "sample_160x120.png")
        write_png(out, frame)
        print("wrote", out)
