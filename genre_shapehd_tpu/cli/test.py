"""Test entry point mirroring /root/reference/test.py.

Usage (reference-script compatible, e.g. scripts/test_genre.sh):
  python -m genre_shapehd_tpu.cli.test --net genre_full_model \
      --net_file logs/.../best.pt \
      --input_rgb 'downloads/data/test/genre/*_rgb.*' \
      --input_mask 'downloads/data/test/genre/*_silhouette.*' \
      --output_dir output/test --overwrite
"""

from __future__ import annotations

import os
import shutil
import sys

from ..core.registry import get_dataset, get_model
from ..data.loader import DataLoader
from ..utils import str_stage, str_verbose
from . import options


def main(argv=None) -> int:
    opt, _ = options.parse_test(argv)

    from ..core.cache import enable_compile_cache
    enable_compile_cache()

    print(str_stage, "Setting up output directory")
    output_dir = opt.output_dir
    output_dir += ("_" + opt.suffix.format(**vars(opt))) if opt.suffix else ""
    opt.output_dir = output_dir
    if os.path.isdir(output_dir):
        if not opt.overwrite:
            raise RuntimeError(
                f"output directory {output_dir} exists; pass --overwrite "
                "to clobber (test.py:42-48)")
        shutil.rmtree(output_dir)
    os.makedirs(output_dir)

    print(str_stage, "Setting up the model")
    model_cls = get_model(opt.net, test=True)
    model = model_cls(opt)
    print(str_verbose, model.__class__.__module__)

    print(str_stage, "Setting up data loader")
    dataset = get_dataset("test")(opt, model=model)
    loader = DataLoader(dataset, batch_size=opt.batch_size, shuffle=False,
                        num_workers=opt.workers, drop_last=False)
    print(str_verbose, f"{len(dataset)} samples")

    print(str_stage, "Testing")
    for i, batch in enumerate(loader):
        model.test_on_batch(i, batch)
        print(str_verbose, f"batch {i + 1}/{len(loader)} done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
