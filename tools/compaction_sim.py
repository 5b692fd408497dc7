#!/usr/bin/env python3
"""Simulate megakernel wall-clock under wavefront compaction designs, using
per-ray depth dumps from tools/waste_probe.py (/tmp/depths_<scene>.npz).

Model: TPU grid steps are serial; a tile costs max(remaining-depth over its
rays) sphere sweeps per phase (plus nothing when fully dead). Compaction
reorders GROUPS of g rays (stable, alive-first) between phases. Reported
"work" = total lane-bounces / live-ray-bounces (1.0 = zero waste).

Usage: python tools/compaction_sim.py [--scene large]
"""
import argparse
import itertools

import numpy as np


def simulate(depth, tile, schedule, g):
    """Return lane-work in units of tile-bounces summed over phases."""
    n = depth.size
    rem = depth.astype(np.int64).copy()
    work = 0
    b0 = 0
    for k in schedule:
        # iterations each ray needs this phase
        it = np.clip(rem, 0, k)
        # tile cost = max over tile
        tiles = it.reshape(-1, tile)
        work += int(tiles.max(axis=1).sum()) * tile
        rem -= it
        # compact groups of g: stable partition by any-alive
        if rem.max() > 0:
            groups_alive = (rem.reshape(-1, g) > 0).any(axis=1)
            order = np.argsort(~groups_alive, kind="stable")
            rem = rem.reshape(-1, g)[order].reshape(n)
        else:
            break
    return work


def compositions(total):
    """All ordered compositions of `total` (2^(total-1) of them)."""
    if total == 0:
        yield ()
        return
    for first in range(1, total + 1):
        for rest in compositions(total - first):
            yield (first,) + rest


def search(depth, tile, g, cost_tile_bounces):
    """Exhaustive cost-aware schedule search. cost = per-compaction-round
    overhead expressed in tile-bounce equivalents."""
    live = depth.sum()
    best = None
    for sched in compositions(int(depth.max())):
        w = simulate(depth, tile, sched, g) / tile
        total = w + cost_tile_bounces * (len(sched) - 1)
        if best is None or total < best[0]:
            best = (total, sched, w)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", nargs="+", default=["small", "medium", "large"])
    ap.add_argument("--cost", type=float, default=None,
                    help="compaction cost in ms; enables cost-aware search")
    ap.add_argument("--tile-bounce-us", type=float, default=11.7,
                    help="measured per-tile bounce sweep time (large scene)")
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--g", type=int, default=8)
    args = ap.parse_args()

    if args.cost is not None:
        for scene in args.scenes:
            d = np.load(f"/tmp/depths_{scene}.npz")
            depth = d["depth"]
            cost_tb = args.cost * 1e3 / args.tile_bounce_us
            total, sched, w = search(depth, args.tile, args.g, cost_tb)
            base = simulate(depth, args.tile, (int(depth.max()),), args.g) \
                / args.tile
            print(f"{scene}: tile={args.tile} g={args.g} "
                  f"cost={args.cost}ms({cost_tb:.0f}tb): best sched={sched} "
                  f"kernel_tb={w:.0f} total_tb={total:.0f} "
                  f"oneshot_tb={base:.0f} speedup={base/total:.2f}x")
        return

    for scene in args.scenes:
        d = np.load(f"/tmp/depths_{scene}.npz")
        depth = d["depth"]
        live = int(depth.sum())
        print(f"== {scene}: rays={depth.size} live_bounces={live} "
              f"mean_depth={depth.mean():.2f} "
              f"alive@2={100*(depth>2).mean():.1f}% "
              f"alive@4={100*(depth>4).mean():.1f}% "
              f"alive@6={100*(depth>6).mean():.1f}%")
        schedules = [(11,), (2, 9), (3, 8), (2, 3, 6), (2, 2, 2, 5),
                     (1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1),
                     (2, 2, 2, 2, 3), (3, 3, 5), (4, 7), (2, 2, 7)]
        for tile in (512, 1024, 2048):
            for g in (1, 8, 32, 128):
                best = None
                for sched in schedules:
                    w = simulate(depth, tile, sched, g)
                    if best is None or w < best[0]:
                        best = (w, sched)
                base = simulate(depth, tile, (11,), g)
                print(f"  tile={tile} g={g}: oneshot={base/live:.2f}x "
                      f"best={best[0]/live:.2f}x sched={best[1]} "
                      f"(speedup {base/best[0]:.2f}x)")


if __name__ == "__main__":
    main()
