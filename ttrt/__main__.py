"""``python -m ttrt`` — run the animated demo."""

import sys

from ttrt.app import main

sys.exit(main())
