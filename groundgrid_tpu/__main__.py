"""``python -m groundgrid_tpu`` == the groundgrid-tpu CLI."""

import sys

from groundgrid_tpu.runtime.cli import main

if __name__ == "__main__":
    sys.exit(main())
