"""Per-run reproducibility scaffolding.

The reference backs up the driver's own source files and appends the
exact command line into every results dir (`run_graphcount.py:379-387`,
`run_ogb_mol.py:293-311`) — its substitute for tests. Here one helper
does both for any driver: the command line goes to `cmd_input.txt`
(append, as in the reference) and the invoking script plus any extra
files are copied in.
"""

from __future__ import annotations

import os
import shutil
import sys


def backup_run(res_dir: str, *extra_files: str) -> None:
    """Append the command line to `<res_dir>/cmd_input.txt` and copy the
    entry-point script (sys.argv[0]) and `extra_files` into `res_dir`."""
    os.makedirs(res_dir, exist_ok=True)
    cmd = "python " + " ".join(sys.argv) + "\n"
    with open(os.path.join(res_dir, "cmd_input.txt"), "a") as f:
        f.write(cmd)
    for path in (sys.argv[0], *extra_files):
        if path and os.path.isfile(path):
            shutil.copy(path, res_dir)
