#!/usr/bin/env python3
"""Root-level launcher matching the fork's ``python strip_modules.py ...``
invocation (reference /root/reference/strip_modules.py); the implementation
lives in fbk_fairseq_st_tpu/scripts/strip_modules.py."""

from fbk_fairseq_st_tpu.scripts.strip_modules import main

if __name__ == "__main__":
    main()
