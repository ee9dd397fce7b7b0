"""Checkpoint conversion CLI (both directions):

    # torch -> framework (reads any of the reference's three checkpoint
    # shapes, SURVEY.md §5; output loads via every CLI's --model_path)
    python -m dgcnn_tpu.convert.cli <in.t7|.checkpoint> <out.msgpack> \
        --model {dgcnn_cls,pointnet,dgcnn_partseg,dgcnn_semseg,net} \
        [--n_blocks N]

    # framework -> torch (writes a torch-loadable state dict; the fork
    # models strict-load into the reference modules)
    python -m dgcnn_tpu.convert.cli <in.msgpack> <out.t7> --model ... \
        --to_torch [--n_blocks N]
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
EXPORTERS = {
    "dgcnn_cls": "export_dgcnn_cls",
    "pointnet": "export_pointnet",
    "dgcnn_partseg": "export_dgcnn_partseg",
    "dgcnn_semseg": "export_dgcnn_semseg",
    "net": "export_net",
}


def main(argv=None) -> None:
    from dgcnn_tpu import convert as C
    from dgcnn_tpu.train.checkpoint import load_model, save_model

    p = argparse.ArgumentParser(description="torch <-> dgcnn_tpu checkpoint")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--model", required=True, choices=sorted(CONVERTERS))
    p.add_argument("--n_blocks", type=int, default=2,
                   help="transformer blocks (net only)")
    p.add_argument("--to_torch", action="store_true",
                   help="reverse direction: msgpack variables -> torch "
                        "state dict")
    args = p.parse_args(argv)

    if args.to_torch:
        variables = load_model(args.src)
        fn = getattr(C, EXPORTERS[args.model])
        sd = (fn(variables, args.n_blocks) if args.model == "net"
              else fn(variables))
        C.save_torch_checkpoint(args.dst, sd)
    else:
        sd = C.load_torch_checkpoint(args.src)
        fn = getattr(C, CONVERTERS[args.model])
        variables = fn(sd, args.n_blocks) if args.model == "net" else fn(sd)
        save_model(args.dst, variables)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
