"""Run the REFERENCE pipeline end-to-end in this environment.

Executes /root/reference/RAM_Net/{test,evaluation}.py as __main__ via runpy
(imported, never copied) with the import shims from ref_shims installed.
Used by tests/test_pipeline_parity.py to produce the reference's own output
tree and metric printout for cross-implementation comparison (the BASELINE
abs-rel/SiLog parity oracle).

Usage:
  python tests/ref_pipeline_runner.py test --path_to_model M --config C \
      --output_path O --data_folder D        # env PREPROCESSED_DATASETS_FOLDER
  python tests/ref_pipeline_runner.py evaluation --target_dataset T \
      --predictions_dataset P --clip_distance X --reg_factor Y ...
"""
import os
import runpy
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
if HERE not in sys.path:
    sys.path.insert(0, HERE)

import ref_shims  # noqa: E402


def main():
    script = sys.argv[1]
    assert script in ("test", "evaluation"), script
    ref_shims.install_all()
    # runpy executes the reference script with our argv; its own argparse
    # (test.py:400-416, evaluation.py:14-34) sees everything after `script`.
    sys.argv = [script + ".py"] + sys.argv[2:]
    runpy.run_path(os.path.join(ref_shims.REF_ROOT, script + ".py"),
                   run_name="__main__")


if __name__ == "__main__":
    main()
