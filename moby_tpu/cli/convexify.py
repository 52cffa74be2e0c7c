"""Entry point: python -m moby_tpu.cli.convexify (reference programs/convexify.cpp)."""
import sys

from .meshutil import convexify_main

if __name__ == "__main__":
    sys.exit(convexify_main())
