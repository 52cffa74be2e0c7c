"""Entry point: python -m moby_tpu.cli.center (reference programs/center.cpp)."""
import sys

from .meshutil import center_main

if __name__ == "__main__":
    sys.exit(center_main())
