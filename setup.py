from setuptools import find_packages, setup

setup(
    name="block_transformer_tpu",
    version="0.1.0",
    packages=find_packages(include=["block_transformer_tpu*"]),
    python_requires=">=3.10",
)
