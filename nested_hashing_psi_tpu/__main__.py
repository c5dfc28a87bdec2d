from nested_hashing_psi_tpu.cli import main
import sys

sys.exit(main())
