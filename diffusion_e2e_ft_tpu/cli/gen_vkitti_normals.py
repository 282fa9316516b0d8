"""Generate VKITTI GT surface normals from GT depth (offline, once per dataset).

Capability parity: `/root/reference/depth-to-normal-translator/python/gen_vkitti_normals.py`
— walks `vkitti_2.0.3_depth`, runs the D2NT v3 pipeline (DAG gradients + MRF), and
writes 16-bit `vkitti_DAG_normals` pngs the training loader consumes.
"""

from __future__ import annotations

from diffusion_e2e_ft_tpu.cli.common import make_parser
from diffusion_e2e_ft_tpu.tools.depth_to_normal import generate_vkitti_normals


def build_parser():
    p = make_parser(__doc__)
    p.add_argument("--vkitti_root", default="data/virtual_kitti_2")
    p.add_argument("--version", choices=["basic", "v2", "v3"], default="v3")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    n = generate_vkitti_normals(args.vkitti_root, version=args.version)
    print(f"[d2n] generated normals for {n} frames")


if __name__ == "__main__":
    main()
