"""Build the native env engine shared library.

Invoked automatically on first use (bridge.py) or manually:
    python -m deep_neuroevolution_tpu.native.build [--with-ale ALE_PREFIX]

Plain g++ (no cmake dependency): the engine is two translation units with
only the C++ standard library; the ALE backend is compiled in when an ALE
install prefix (headers + libale.so) is provided.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

SRC_DIR = Path(__file__).resolve().parent
LIB_NAME = "libnevo_env.so"


def lib_path() -> Path:
    return SRC_DIR / LIB_NAME


def build(with_ale: str | None = None, verbose: bool = False) -> Path:
    out = lib_path()
    src = SRC_DIR / "env_engine.cpp"
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-fPIC",
        "-shared",
        "-pthread",
        "-Wall",
        str(src),
        "-o",
        str(out),
    ]
    if with_ale:
        cmd[1:1] = [
            "-DHAVE_ALE",
            f"-I{with_ale}/include/ale",
            f"-L{with_ale}/lib",
            "-lale",
            f"-Wl,-rpath,{with_ale}/lib",
        ]
    if verbose:
        print(" ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, capture_output=not verbose)
    return out


def build_ale_stub(verbose: bool = False) -> Path:
    """Compile the HAVE_ALE code path against the header-only API stub
    (ale_stub/ale_interface.hpp) — validates that the real-ALE backend
    compiles and steps without the GPL ALE checkout. Output is a separate
    .so so the default engine stays stub-free."""
    out = SRC_DIR / "libnevo_env_alestub.so"
    src = SRC_DIR / "env_engine.cpp"
    cmd = [
        "g++", "-O2", "-std=c++17", "-fPIC", "-shared", "-pthread", "-Wall",
        "-DHAVE_ALE", f"-I{SRC_DIR / 'ale_stub'}",
        str(src), "-o", str(out),
    ]
    if verbose:
        print(" ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, capture_output=not verbose)
    return out


def ensure_built() -> Path:
    out = lib_path()
    src = SRC_DIR / "env_engine.cpp"
    if not out.exists() or out.stat().st_mtime < src.stat().st_mtime:
        build(with_ale=os.environ.get("NEVO_ALE_PREFIX"))
    return out


def build_stress(tsan: bool = True) -> Path:
    """Build the TSAN concurrency stress binary (engine_stress_test.cpp)."""
    out = SRC_DIR / ("stress_tsan" if tsan else "stress")
    cmd = ["g++", "-O1", "-g", "-std=c++17", "-pthread", "-Wall"]
    if tsan:
        cmd.append("-fsanitize=thread")
    cmd += [str(SRC_DIR / "env_engine.cpp"), str(SRC_DIR / "engine_stress_test.cpp"), "-o", str(out)]
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    if "--stress" in sys.argv:
        binary = build_stress(tsan="--no-tsan" not in sys.argv)
        print(binary)
        sys.exit(subprocess.run([str(binary)]).returncode)
    ale = None
    if "--with-ale" in sys.argv:
        ale = sys.argv[sys.argv.index("--with-ale") + 1]
    print(build(with_ale=ale, verbose=True))
