"""`python -m acoss_tpu` -> the CLI (benchmark / extract)."""

from acoss_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
