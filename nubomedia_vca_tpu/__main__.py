"""`python -m nubomedia_vca_tpu <filter> ...` — see cli.py."""

import sys

from .cli import main

sys.exit(main())
