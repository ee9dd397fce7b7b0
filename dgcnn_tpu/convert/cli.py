"""Checkpoint conversion CLI:

    python -m dgcnn_tpu.convert.cli <in.t7|.checkpoint> <out.msgpack> \
        --model {dgcnn_cls,pointnet,dgcnn_partseg,dgcnn_semseg,net} \
        [--n_blocks N]

Reads any of the reference's three torch checkpoint shapes (SURVEY.md §5) and
writes the framework's msgpack variables file, loadable by every CLI's
--model_path/--model_root.
"""
from __future__ import annotations

import argparse

CONVERTERS = {
    "dgcnn_cls": "convert_dgcnn_cls",
    "pointnet": "convert_pointnet",
    "dgcnn_partseg": "convert_dgcnn_partseg",
    "dgcnn_semseg": "convert_dgcnn_semseg",
    "net": "convert_net",
}


def main(argv=None) -> None:
    from dgcnn_tpu import convert as C
    from dgcnn_tpu.train.checkpoint import save_model

    p = argparse.ArgumentParser(description="torch -> dgcnn_tpu checkpoint")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--model", required=True, choices=sorted(CONVERTERS))
    p.add_argument("--n_blocks", type=int, default=2,
                   help="transformer blocks (net only)")
    args = p.parse_args(argv)

    sd = C.load_torch_checkpoint(args.src)
    fn = getattr(C, CONVERTERS[args.model])
    variables = fn(sd, args.n_blocks) if args.model == "net" else fn(sd)
    save_model(args.dst, variables)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
