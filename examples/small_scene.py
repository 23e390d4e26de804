"""Config B example: mirror + glass spheres with point/directional lights
(the examples/small_scene.rs analogue — that one loads cornell; BASELINE.md
Config B specifies this sphere scene)."""

import sys

from pathtracer_tpu.core.film import to_rgb8
from pathtracer_tpu.integrator import PathConfig, PathIntegrator
from pathtracer_tpu.scene.procedural import small_scene
from pathtracer_tpu.utils.image import write_png


def main(out="small_scene.png", res=(640, 480), spp=8):
    cam, scene = small_scene(res)
    integ = PathIntegrator(PathConfig(max_depth=8), spp=spp)
    film = integ.render(cam, scene)
    write_png(out, to_rgb8(film))
    print(f"wrote {out} ({integ.last_ray_count / 1e6:.1f}M rays)")


if __name__ == "__main__":
    main(*sys.argv[1:2])
