"""Top-level CLI dispatcher: ``python -m munit_tpu <command> [args...]``.

One entry point over the reference's three scripts (train.py / test.py /
test_batch.py) plus this framework's additional tools. Each subcommand is
the corresponding ``munit_tpu.cli.*`` (or serve) module's ``main``.
"""

import sys

COMMANDS = {
    "train": ("munit_tpu.cli.train", "full training loop (reference train.py)"),
    "translate": ("munit_tpu.cli.translate",
                  "guided single-style folder inference (reference test.py)"),
    "translate_batch": ("munit_tpu.cli.translate_batch",
                        "k-style batch inference + IS/CIS (reference test_batch.py)"),
    "evaluate": ("munit_tpu.cli.evaluate",
                 "FID/KID/slerp-sweep evaluation"),
    "compute_moments": ("munit_tpu.cli.compute_moments",
                        "precompute real-data inception moments for FID"),
    "checkpoint_tools": ("munit_tpu.cli.checkpoint_tools",
                         "convert/pack checkpoints (.pt <-> orbax, bf16/int8 artifacts)"),
    "serve": ("munit_tpu.serve.server",
              "HTTP inference service with dynamic micro-batching"),
}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m munit_tpu <command> [args...]\n\ncommands:")
        for name, (_, desc) in COMMANDS.items():
            print(f"  {name:<18} {desc}")
        return 0 if argv else 2
    cmd, rest = argv[0], argv[1:]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd!r}; run with --help for the list",
              file=sys.stderr)
        return 2
    import importlib
    mod = importlib.import_module(COMMANDS[cmd][0])
    return mod.main(rest)


if __name__ == "__main__":
    sys.exit(main())
