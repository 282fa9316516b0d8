"""Shared CLI plumbing: argparse with @argfile support, image folder walking,
dataset-config YAML loading."""

from __future__ import annotations

import argparse
import glob
import os
from typing import Dict, List

EXTENSION_LIST = (".jpg", ".jpeg", ".png", ".bmp", ".webp", ".tif", ".tiff")


def make_parser(description: str) -> argparse.ArgumentParser:
    """Parser accepting `@args.txt` files with one `--flag value` pair per line
    (the DSINE convention, `/root/reference/DSINE/projects/__init__.py:7-154`)."""
    p = argparse.ArgumentParser(description=description, fromfile_prefix_chars="@")
    p.convert_arg_line_to_args = lambda line: line.split()
    return p


def list_images(input_dir: str) -> List[str]:
    files = []
    for f in sorted(glob.glob(os.path.join(input_dir, "*"))):
        if os.path.splitext(f)[1].lower() in EXTENSION_LIST:
            files.append(f)
    return files


def load_dataset_config(path: str) -> Dict:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def load_image_rgb(path: str):
    import numpy as np
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def save_image(path: str, array) -> None:
    from PIL import Image

    Image.fromarray(array).save(path)
