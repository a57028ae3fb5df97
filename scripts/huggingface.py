"""Hugging Face Hub download helper (parity: reference
scripts/huggingface.py — snapshot fetch with pattern filters and resume).

    python scripts/huggingface.py download <repo-id> [--local-dir DIR]
        [--revision REV] [--include PAT ...] [--exclude PAT ...]

Thin front end over `huggingface_hub.snapshot_download` (the reference
vendors a 1.5k-line downloader; the hub client is the maintained
equivalent).  Degrades with a clear message when the package or network
is unavailable (this build environment has neither)."""

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    dl = sub.add_parser("download", help="download a model snapshot")
    dl.add_argument("repo_id")
    dl.add_argument("--local-dir", default=None)
    dl.add_argument("--revision", default=None)
    dl.add_argument("--include", nargs="*", default=None,
                    help="allow file patterns (e.g. '*.safetensors')")
    dl.add_argument("--exclude", nargs="*", default=None,
                    help="ignore file patterns")
    dl.add_argument("--token", default=None)
    args = ap.parse_args()

    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        raise SystemExit(
            "huggingface_hub is not installed; install it (or place the "
            "checkpoint locally and pass its directory to Model.init)")
    path = snapshot_download(
        args.repo_id, local_dir=args.local_dir, revision=args.revision,
        allow_patterns=args.include, ignore_patterns=args.exclude,
        token=args.token,
    )
    print(path)


if __name__ == "__main__":
    main()
