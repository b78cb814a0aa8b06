import sys
import compat  # noqa: F401
sys.argv = ["train.py"] + sys.argv[1:]
import train
train.main()
