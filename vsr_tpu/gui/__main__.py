"""``python -m vsr_tpu.gui`` — launch the browser GUI."""

import sys

from vsr_tpu.gui.server import main

if __name__ == "__main__":
    sys.exit(main())
