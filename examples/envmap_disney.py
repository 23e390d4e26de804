"""Config D example: HDR envmap importance sampling + Disney BSDF spheres."""

import sys

from pathtracer_tpu.core.film import to_rgb8
from pathtracer_tpu.integrator import PathConfig, PathIntegrator
from pathtracer_tpu.scene.procedural import envmap_disney_scene
from pathtracer_tpu.utils.image import write_png


def main(out="envmap_disney.png", res=(640, 480), spp=32, depth=8):
    cam, scene = envmap_disney_scene(res)
    integ = PathIntegrator(PathConfig(max_depth=depth), spp=spp)
    film = integ.render(cam, scene)
    write_png(out, to_rgb8(film))
    print(f"wrote {out} ({integ.last_ray_count / 1e6:.1f}M rays)")


if __name__ == "__main__":
    main(*sys.argv[1:2])
