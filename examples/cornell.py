"""Config A example: the Mitsuba Cornell box (data/cornell-box.xml)."""

import sys

from pathtracer_tpu.core.film import to_rgb8
from pathtracer_tpu.integrator import PathConfig, PathIntegrator
from pathtracer_tpu.scene.mitsuba import load_mitsuba
from pathtracer_tpu.utils.image import write_png


def main(out="cornell.png", res=(256, 256), spp=4, depth=5):
    cam, scene, _ = load_mitsuba("data/cornell-box.xml", resolution=res)
    integ = PathIntegrator(PathConfig(max_depth=depth), spp=spp)
    film = integ.render(cam, scene)
    write_png(out, to_rgb8(film))
    print(f"wrote {out} ({integ.last_ray_count / 1e6:.1f}M rays)")


if __name__ == "__main__":
    main(*sys.argv[1:2])
