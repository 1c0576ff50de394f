"""Face-tool CLIs: find_faces / face_segment.

Reference entry points (setup.py:36-47): both require user-supplied
pretrained weights (YOLO darknet files, BiSeNet checkpoint), as in the
reference; the CLIs validate inputs and fail with clear instructions when
weights are absent.
"""

from __future__ import annotations

import os

import click
import numpy as np
from PIL import Image


@click.command()
@click.option("--input_dir", "-i", required=True, type=click.Path(exists=True))
@click.option("--output_dir", "-o", required=True, type=click.Path())
@click.option("--yolo_cfg", default=None, type=click.Path())
@click.option("--yolo_weights", default=None, type=click.Path())
@click.option("--margin", default=0.2, type=float)
def find_faces(input_dir, output_dir, yolo_cfg, yolo_weights, margin):
    """Detect and crop faces from a folder of images."""
    from rumpy_tpu.utils.face_tools import YoloFaceDetector, crop_faces
    try:
        det = YoloFaceDetector(yolo_cfg, yolo_weights)
    except NotImplementedError as e:
        raise click.ClickException(str(e))
    os.makedirs(output_dir, exist_ok=True)
    count = 0
    for name in sorted(os.listdir(input_dir)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        img = np.asarray(Image.open(os.path.join(input_dir, name))
                         .convert("RGB"))
        for j, crop in enumerate(crop_faces(img, det, margin)):
            Image.fromarray(crop).save(
                os.path.join(output_dir,
                             f"{os.path.splitext(name)[0]}_face{j}.png"))
            count += 1
    click.echo(f"saved {count} face crops to {output_dir}")


@click.command()
@click.option("--input_dir", "-i", required=True, type=click.Path(exists=True))
@click.option("--output_dir", "-o", required=True, type=click.Path())
@click.option("--weights", default=None, type=click.Path())
@click.option("--save_superimposed_images", is_flag=True,
              help="Additionally save inputs blended with the parsing map.")
def face_segment(input_dir, output_dir, weights,
                 save_superimposed_images):
    """BiSeNet face parsing over a folder of aligned faces (reference
    face_segmentation/segmentation.py CLI): writes a colorized parsing map
    per image, resized back to the original dimensions."""
    from rumpy_tpu.utils.face_segmentation import (BiSeNetSegmenter,
                                                   colorize_parsing)
    try:
        seg = BiSeNetSegmenter(weights)
    except NotImplementedError as e:
        raise click.ClickException(str(e))
    os.makedirs(output_dir, exist_ok=True)
    count = 0
    for name in sorted(os.listdir(input_dir)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
            continue
        img = Image.open(os.path.join(input_dir, name)).convert("RGB")
        parsing = seg.parse(np.asarray(img))
        vis = Image.fromarray(colorize_parsing(parsing)).resize(
            img.size, Image.BILINEAR)
        vis.save(os.path.join(output_dir, name))
        if save_superimposed_images:
            blend = Image.blend(img, vis, 0.5)
            base, ext = os.path.splitext(name)
            blend.save(os.path.join(output_dir,
                                    f"{base}_superimposed{ext}"))
        count += 1
    click.echo(f"segmented {count} images into {output_dir}")
