"""Entry point: python -m moby_tpu.cli.adjust_center (reference programs/adjust-center.cpp)."""
import sys

from .meshutil import adjust_center_main

if __name__ == "__main__":
    sys.exit(adjust_center_main())
