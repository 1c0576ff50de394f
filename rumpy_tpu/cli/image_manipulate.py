"""image_manipulate CLI — offline degradation datagen.

Mirror of rumpy/image_tools/click_cli.py:6-39 +
image_pipeline.py:260-311: run a configured degradation pipeline over a
folder of images, writing degraded outputs + metadata CSVs + config copy.
"""

from __future__ import annotations

import click

from rumpy_tpu.config.loader import load_config
from rumpy_tpu.degradations.pipeline import pipeline_prep_and_run


@click.command()
@click.option("--pipeline_config", "-p", required=True,
              type=click.Path(exists=True), help="TOML pipeline config.")
@click.option("--source_dir", "-s", default=None, type=click.Path())
@click.option("--output_dir", "-o", default=None, type=click.Path())
@click.option("--seed", default=None, type=int)
@click.option("--multiples", default=None, type=int,
              help="Degraded copies to generate per image (_qN suffixes).")
@click.option("--recursive/--no-recursive", default=False)
def main(pipeline_config, source_dir, output_dir, seed, multiples, recursive):
    cfg = load_config(pipeline_config).as_plain()
    kwargs = {}
    if source_dir:
        kwargs["source_dir"] = source_dir
    if output_dir:
        kwargs["output_dir"] = output_dir
    if seed is not None:
        kwargs["seed"] = seed
    if multiples is not None:
        kwargs["multiples"] = multiples
    out = pipeline_prep_and_run(cfg, recursive=recursive, **kwargs)
    click.echo(f"degraded images written to {out}")


if __name__ == "__main__":
    main()
