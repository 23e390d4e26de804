"""Config E stand-in: BVH-heavy box-field scene (Sponza-scale triangle
count; no Sponza asset ships with the repo). Use --mesh via the CLI or
parallel.mesh for multi-chip runs."""

import sys

from pathtracer_tpu.core.film import to_rgb8
from pathtracer_tpu.integrator import PathConfig, PathIntegrator
from pathtracer_tpu.scene.procedural import box_field_scene
from pathtracer_tpu.utils.image import write_png


def main(out="box_field.png", res=(960, 540), spp=4, n_boxes=4000):
    cam, scene = box_field_scene(res, n_boxes=n_boxes)
    integ = PathIntegrator(PathConfig(max_depth=5), spp=spp)
    film = integ.render(cam, scene)
    write_png(out, to_rgb8(film))
    print(f"wrote {out} ({integ.last_ray_count / 1e6:.1f}M rays)")


if __name__ == "__main__":
    main(*sys.argv[1:2])
