#!/usr/bin/env python
"""Exact pixel gradients through the renderer.

`render_mean` is an ordinary differentiable JAX function: any scalar loss on
its output yields gradients w.r.t. EVERY scene parameter (sphere centers,
radii, albedo, emissive, specular, ior, triangle vertices) and the camera
pose, in one `jax.grad` call. Discrete choices (which sphere a ray hits,
refract-vs-reflect) are held fixed by the counter-based RNG, so the
Monte-Carlo integrand is piecewise smooth and autodiff gives the exact
gradient of the estimator (SURVEY.md §7 "Gradients through discreteness";
verified against central differences through the independent C++ oracle in
tests/test_grad_oracle.py).

Estimator semantics worth knowing: with hit selection and refract-vs-reflect
held fixed, the gradient is the TRUE derivative almost everywhere — which is
exactly 0 for parameters whose only effect is moving discontinuity
boundaries. In a sky-less scene (e.g. 'rgb') path radiance is a product of
material constants, so camera/geometry gradients vanish a.e. even though
finite differences (which straddle boundaries) do not; materials still get
exact nonzero gradients. Scenes with a sky gradient (e.g. 'rtweekend',
the default here) have radiance continuous in ray direction, so camera and
geometry gradients flow too.

On a TPU, pass --backend fused to run both sweeps on the custom-VJP Pallas
bounce kernels (the headline-benchmark path).
"""
import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="rtweekend")
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--height", type=int, default=54)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--backend", default="jnp",
                    choices=["jnp", "pallas", "fused"])
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tpu_ray import default_camera, make_scene
    from tpu_ray.grad import render_mean

    scene = make_scene(args.scene)
    camera = default_camera(scene)

    # Loss: mean brightness of the rendered image. Its gradient answers
    # "how does each parameter move the picture?" — the building block of
    # any inverse-rendering / appearance-optimization objective.
    @jax.jit
    def brightness(scene, camera):
        img = render_mean(scene, camera, width=args.width,
                          height=args.height, spp=args.spp,
                          backend=args.backend)
        return jnp.mean(img)

    (d_scene, d_camera) = jax.grad(brightness, argnums=(0, 1))(scene, camera)

    n = scene.n_real
    print(f"scene '{args.scene}': {n} spheres, backend={args.backend}")
    print(f"d brightness / d albedo     (first {min(n, 4)} spheres):")
    for i in range(min(n, 4)):
        print(f"  sphere {i}: {d_scene.albedo[i]}")
    print(f"d brightness / d radius      : {d_scene.radius[:n]}")
    print(f"d brightness / d center[1]   : {d_scene.center[1]}")
    print(f"d brightness / d camera pos  : {d_camera.position}")
    print(f"d brightness / d camera look : {d_camera.look_at}")
    return d_scene, d_camera


if __name__ == "__main__":
    main()
