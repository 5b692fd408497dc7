#!/usr/bin/env python3
"""Full-resolution golden verification (SURVEY.md §7.1(c)).

Renders each scene at the reference's full 1280x720 resolution, max 50
bounces, on the real TPU (megakernel path) and compares block means of the
quantized u8 image against the reference binary's own full-workload TGA
output (tests/golden/*_full_*.tga, 250 spp — see tests/golden/README.md):

- medium / large vs latest_full_{medium,large}.tga (src/latest).
- small: the optimized reference skips the hollow-glass inner sphere
  (placeholder semantics, SURVEY.md §7.1-5a) while this framework renders it
  correctly (step1 semantics), so small is compared against
  step1_full_small.tga (src/step1 compiled at 250 spp on this box, correct
  glass) EVERYWHERE, and against latest_full_small.tga OUTSIDE the
  reference-internal disagreement mask — the blocks where the reference's
  own two builds (step1 vs latest) disagree with each other, i.e. exactly
  the documented hollow-glass divergence.

Block means over BLOCK x BLOCK pixel squares average out Monte-Carlo sample
noise (RNG streams differ from the reference's by construction) but catch
any systematic shading/geometry error. At the default 128 spp the expected
per-block-mean noise between two independent renders is ~0.3/255, so the
1.25/255 mean / 3.5/255 max tolerances are dominated by real signal.

Measured 2026-08-19 (PARITY.md): means 0.04-0.19/255 — far under tolerance.
The per-scene maxima (2.1 / 2.4 / 1.5 / 3.0) are isolated glass-caustic
blocks: the worst (large, block 13,17) is a sub-pixel refracted feature
seen THROUGH a glass sphere, where one f32 ulp in the refracted direction
moves the feature by pixels. Attribution evidence: our exact float-albedo
XLA path and the megakernel agree there to 0.04/255 at 512 spp, and two
independent reference runs agree with each other (run-to-run max 1.06/255)
— i.e. both renderers are internally deterministic and the gap is
compiler-level float math (-ffast-math -march=native) amplified by a
chaotic light path, not a shading/geometry bug.

Usage: python tools/verify_golden.py [--scenes small,medium,large]
       [--spp 128] [--block 16] [--tol-mean 1.25] [--tol-max 3.5]
Prints one markdown table row per comparison (recorded in PARITY.md) and
exits nonzero if any comparison exceeds tolerance.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")


def block_means(img, block):
    h, w, c = img.shape
    assert h % block == 0 and w % block == 0, (h, w, block)
    return img.reshape(h // block, block, w // block, block, c).mean(
        axis=(1, 3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="small,medium,large")
    ap.add_argument("--spp", type=int, default=128)
    ap.add_argument("--block", type=int, default=16)
    ap.add_argument("--tol-mean", type=float, default=1.25)
    ap.add_argument("--tol-max", type=float, default=3.5)
    ap.add_argument("--save", action="store_true",
                    help="write our renders to out_full_<scene>.tga")
    ap.add_argument("--respawn", action="store_true",
                    help="render through the persistent-lane sample-respawn "
                         "engine (the production default) instead of the "
                         "one-shot megakernel")
    args = ap.parse_args()

    from rays1bench_tpu.core.cache import enable
    enable()
    import numpy as np
    from rays1bench_tpu.core.config import RenderConfig
    from rays1bench_tpu.kernels.pipeline import render_image_pallas
    from rays1bench_tpu.render.pipeline import to_srgb_u8
    from rays1bench_tpu.scene import builders, tga

    cfg = RenderConfig(width=1280, height=720, spp=args.spp, max_bounces=50)
    rows = []
    failed = False

    def compare(tag, ours_bm, ref_bm, mask=None):
        nonlocal failed
        d = np.abs(ours_bm - ref_bm)
        nb = d.shape[0] * d.shape[1]
        if mask is not None:
            d = np.where(mask[:, :, None], d, 0.0)
            nb = int(mask.sum())
        dm = float(d.sum() / (nb * d.shape[-1]))
        dx = float(d.max())
        by, bx, ch = np.unravel_index(np.argmax(d), d.shape)
        ok = dm <= args.tol_mean and dx <= args.tol_max
        failed |= not ok
        rows.append(f"| {tag} | {dm:.3f} | {dx:.3f} | {nb} | "
                    f"{'pass' if ok else 'FAIL'} |")
        print(rows[-1] + f"   worst: block ({by},{bx}) ch{ch} "
              f"px~({by*args.block},{bx*args.block}) "
              f"ours={ours_bm[by,bx,ch]:.1f} ref={ref_bm[by,bx,ch]:.1f}",
              flush=True)

    print(f"| comparison ({args.spp} spp vs 250 spp, {args.block}x"
          f"{args.block} block means, u8) | mean err | max err | blocks | "
          f"verdict |")
    print("|---|---|---|---|---|")
    for name in args.scenes.split(","):
        scene = builders.SCENES[name](cfg.aspect)
        img, _ = render_image_pallas(scene.spheres, scene.camera.build(),
                                     cfg, n_real=scene.n_real,
                                     respawn=args.respawn)
        ours = np.asarray(to_srgb_u8(img)).astype(np.float64)
        if args.save:
            tga.write_rgb24(f"out_full_{name}.tga", np.asarray(
                to_srgb_u8(img)))
        ours_bm = block_means(ours, args.block)
        latest = tga.read_rgb24(
            os.path.join(GOLDEN_DIR, f"latest_full_{name}.tga")).astype(
            np.float64)
        latest_bm = block_means(latest, args.block)
        if name == "small":
            step1 = tga.read_rgb24(
                os.path.join(GOLDEN_DIR, "step1_full_small.tga")).astype(
                np.float64)
            step1_bm = block_means(step1, args.block)
            compare("small vs step1 (correct glass), all blocks",
                    ours_bm, step1_bm)
            # Reference-internal disagreement = the hollow-glass divergence.
            agree = np.abs(step1_bm - latest_bm).max(axis=-1) <= args.tol_max
            compare("small vs latest, reference-agreeing blocks",
                    ours_bm, latest_bm, mask=agree)
        else:
            compare(f"{name} vs latest, all blocks", ours_bm, latest_bm)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
