"""Preprocess raw Hypersim HDF5 scenes into the training layout (offline).

Capability parity: `/root/reference/Marigold/script/dataset_preprocess/hypersim/
preprocess_hypersim.py` — tone-mapped RGB pngs, uint16 mm depth pngs (planar depth
from distance), and the per-split CSV the Hypersim training loader reads.
"""

from __future__ import annotations

import os

from diffusion_e2e_ft_tpu.cli.common import make_parser


def build_parser():
    p = make_parser(__doc__)
    p.add_argument("--hypersim_raw_dir", required=True, help="directory of ai_XXX_XXX scenes")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--camera", default="cam_00")
    p.add_argument("--split_csv_name", default="filename_meta_train.csv")
    return p


def main(argv=None):
    import pandas as pd

    from diffusion_e2e_ft_tpu.tools.hypersim_preprocess import preprocess_scene_hdf5

    args = build_parser().parse_args(argv)
    out_train = os.path.join(args.output_dir, "train")
    rows = []
    scenes = sorted(
        d for d in os.listdir(args.hypersim_raw_dir)
        if os.path.isdir(os.path.join(args.hypersim_raw_dir, d))
    )
    for scene in scenes:
        rows.extend(
            preprocess_scene_hdf5(
                os.path.join(args.hypersim_raw_dir, scene), out_train, camera=args.camera
            )
        )
    os.makedirs(os.path.join(args.output_dir, "processed", "train"), exist_ok=True)
    csv_path = os.path.join(args.output_dir, "processed", "train", args.split_csv_name)
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    print(f"[hypersim] {len(rows)} frames -> {csv_path}")


if __name__ == "__main__":
    main()
