#!/usr/bin/env python
"""Build the native scdepth_io extension in-place.

Usage: python native/build.py
Produces sc_sfmlearner_release_tpu/_native/scdepth_io*.so; the Python
wrapper (sc_sfmlearner_release_tpu/data/native_io.py) falls back to imageio
when the extension is absent, so building is optional.
"""

import os
import subprocess
import sys
import sysconfig

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT_DIR = os.path.join(REPO, "sc_sfmlearner_release_tpu", "_native")


def main() -> int:
    os.makedirs(OUT_DIR, exist_ok=True)
    open(os.path.join(OUT_DIR, "__init__.py"), "a").close()

    ext = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(OUT_DIR, f"scdepth_io{ext}")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{np.get_include()}",
        os.path.join(HERE, "scdepth_io.cpp"),
        "-ljpeg",
        "-o", out,
    ]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    print(f"built {out}")

    sys.path.insert(0, OUT_DIR)
    import scdepth_io  # noqa: F401

    print("import OK:", scdepth_io.__doc__.splitlines()[0])
    return 0


if __name__ == "__main__":
    sys.exit(main())
