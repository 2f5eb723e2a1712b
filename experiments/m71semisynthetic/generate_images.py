#!/usr/bin/env python
"""Semi-synthetic M71 images: real catalogs, synthetic pixels.

Reference parity: experiments/m71semisynthetic/generate_images.py:26-57
renders the *real* (Hubble-derived) per-tile catalogs through the fitted
``M71ImageModel`` — real star positions/fluxes, synthetic noise — so the
inference model is exactly well-specified while the source configuration
is the real cluster's. Two upgrades over the reference:

- each tile's *padded-region* catalog (stars within ``[-pad, 8+pad)^2``)
  is rendered, so boundary tiles carry their neighbours' photon
  spill-over like the real pixels do;
- the real per-tile sky background replaces the reference's scalar mean
  (real frame background per tile, consumed downstream via
  ``use_tile_backgrounds``).

Requires ``experiments/m71/prepare_data.py`` artifacts
(``../m71/data/m71/tiles.npz`` + ``params.yaml``).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from common import experiment_config

M71_TILES = Path(__file__).parent / ".." / "m71" / "data" / "m71" / "tiles.npz"


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--num-images", type=int, default=None)
    parser.add_argument(
        "--catalog",
        choices=("padded", "intile", "reach"),
        default="padded",
        help="which truth window to render: the 4-px padded catalogs "
        "(default; neighbour spill-over like the real pixels), only "
        "in-tile stars (the no-spill ablation), or every star within "
        "radius-8 render reach (the full real-pixels photon budget; "
        "requires reach_* arrays from experiments/m71/prepare_data.py)",
    )
    parser.add_argument(
        "--config",
        default="config.yaml",
        help="alternate config naming the ablation output "
        "(config_nospill.yaml / config_reach.yaml)",
    )
    args = parser.parse_args()

    import os

    import jax

    # one batched render: per-call tunnel latency dwarfs the compute, so
    # stay off the (flaky) TPU tunnel unless explicitly asked
    if os.environ.get("SMCDET_GEN_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from smcdet_tpu.config import build_image_model

    cfg = experiment_config(__file__, args.config)
    if not M71_TILES.exists():
        raise FileNotFoundError(
            f"{M71_TILES} missing — run experiments/m71/prepare_data.py "
            "first (offline: make_fixture.py then --no-download)"
        )
    m71 = np.load(M71_TILES)
    n = m71["images"].shape[0]
    if args.num_images is not None:
        n = min(n, args.num_images)

    model = build_image_model(cfg.image_model)
    backgrounds = jnp.asarray(m71["background"][:n], dtype=jnp.float32)
    src_key = {"padded": "padded", "intile": "true", "reach": "reach"}[
        args.catalog
    ]
    locs = jnp.asarray(m71[f"{src_key}_locs"][:n], dtype=jnp.float32)
    fluxes = jnp.asarray(m71[f"{src_key}_fluxes"][:n], dtype=jnp.float32)

    key = jax.random.key(cfg.seed)
    images = model.replace(background=backgrounds).sample(key, locs, fluxes)

    out_dir = Path(cfg.output_dir) / cfg.name
    out_dir.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        out_dir / "tiles.npz",
        images=np.asarray(images),
        background=np.asarray(backgrounds),
        checkerboard=m71["checkerboard"][:n],
        true_counts=m71["true_counts"][:n],
        true_locs=m71["true_locs"][:n],
        true_fluxes=m71["true_fluxes"][:n],
        padded_counts=m71["padded_counts"][:n],
        padded_locs=m71["padded_locs"][:n],
        padded_fluxes=m71["padded_fluxes"][:n],
        tile_index=m71["tile_index"][:n],
    )
    print(f"rendered {n} semi-synthetic tiles to {out_dir / 'tiles.npz'}")


if __name__ == "__main__":
    main()
