import sys
import compat  # noqa: F401
sys.argv = ["explainer_main.py"] + sys.argv[1:]
import explainer_main
explainer_main.main()
