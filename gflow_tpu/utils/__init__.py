from .hull import FastConcaveHull2D
from .cli import run_cli
