"""Entry point: python -m moby_tpu.cli.objwrl (reference programs/objwrl.cpp)."""
import sys

from .meshutil import objwrl_main

if __name__ == "__main__":
    sys.exit(objwrl_main())
