#!/usr/bin/env python
"""Inverse rendering: recover perturbed scene parameters from a target image.

The capability the TPU re-design adds on top of reference parity: render a
target with the true scene, perturb materials, then gradient-descend the
perturbed scene back using `make_train_step` (Adam over the full
scene+camera pytree, fixed RNG streams so the loss is deterministic).

The CLI wraps a larger version of this as `python -m tpu_ray.cli fit`.
"""
import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="rgb")
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--height", type=int, default=54)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--backend", default="jnp",
                    choices=["jnp", "pallas", "fused"])
    args = ap.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from tpu_ray import default_camera, make_scene
    from tpu_ray.grad import make_train_step, render_mean

    true_scene = make_scene(args.scene)
    camera = default_camera(true_scene)
    kw = dict(width=args.width, height=args.height, spp=args.spp,
              backend=args.backend)

    # The target a camera would have photographed.
    target = render_mean(true_scene, camera, **kw)

    # Perturb the albedo of every real sphere by a fixed offset.
    n = true_scene.n_real
    bad_albedo = jnp.clip(true_scene.albedo.at[:n].add(0.25), 0.0, 1.0)
    start = dataclasses.replace(true_scene, albedo=bad_albedo)

    # fixed_samples=True: every step renders the same RNG streams as the
    # target, so MSE -> 0 exactly at recovery (the deterministic setting;
    # drop it for fresh-sample stochastic optimization).
    init_fn, step_fn = make_train_step(
        optimizer=optax.adam(args.lr), train_camera=False,
        fixed_samples=True, **kw)
    state = init_fn(start, camera)

    err0 = float(jnp.abs(start.albedo[:n] - true_scene.albedo[:n]).mean())
    for i in range(args.steps):
        state, loss = step_fn(state, target)
        if (i + 1) % max(1, args.steps // 5) == 0:
            err = float(jnp.abs(state.scene.albedo[:n]
                                - true_scene.albedo[:n]).mean())
            print(f"step {i + 1:4d}  image MSE {float(loss):.3e}  "
                  f"albedo |err| {err:.4f}")

    err = float(jnp.abs(state.scene.albedo[:n]
                        - true_scene.albedo[:n]).mean())
    print(f"mean |albedo error|: {err0:.4f} -> {err:.4f}")
    jax.block_until_ready(state.scene.albedo)
    return state, err0, err


if __name__ == "__main__":
    main()
