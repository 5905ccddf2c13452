"""Install future_od_tpu and build the native LAP solver extension.

`pip install -e .` compiles native/lap.cpp into a shared object next to the
package (ctypes loads it; see future_od_tpu/ops/native_lap.py). `native/build.sh`
is the no-install alternative.
"""
import os
import subprocess

from setuptools import Extension, find_packages, setup
from setuptools.command.build_ext import build_ext


class BuildSharedLib(build_ext):
    def run(self):
        here = os.path.dirname(os.path.abspath(__file__))
        subprocess.check_call(["sh", os.path.join(here, "native", "build.sh")])


setup(
    name="future_od_tpu",
    version="0.1.0",
    packages=find_packages(include=["future_od_tpu*"]),
    ext_modules=[Extension("future_od_tpu._lap_placeholder", sources=[])],
    cmdclass={"build_ext": BuildSharedLib},
    install_requires=["jax", "flax", "optax", "orbax-checkpoint", "numpy", "einops"],
    python_requires=">=3.10",
)
