#!/usr/bin/env python
"""Entry point — analog of /root/reference/main.py."""
import sys

from unet_watermark_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
