"""Config C example: microfacet metal/substrate/glass under an area light."""

import sys

from pathtracer_tpu.core.film import to_rgb8
from pathtracer_tpu.integrator import PathConfig, PathIntegrator
from pathtracer_tpu.scene.procedural import microfacet_scene
from pathtracer_tpu.utils.image import write_png


def main(out="microfacet.png", res=(640, 480), spp=64, depth=15):
    cam, scene = microfacet_scene(res)
    integ = PathIntegrator(PathConfig(max_depth=depth), spp=spp)
    film = integ.render(cam, scene)
    write_png(out, to_rgb8(film))
    print(f"wrote {out} ({integ.last_ray_count / 1e6:.1f}M rays)")


if __name__ == "__main__":
    main(*sys.argv[1:2])
