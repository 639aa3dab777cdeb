"""CSV metrics logging (reference: per-epoch CSV rows with a header at
``train_pkl_file_task_aware.py:577-586`` and ``{model}_test_results.csv``
from ``test_pkl_file_2.py:266-292``)."""

from __future__ import annotations

import csv
import os
from typing import Iterable, Optional


class CSVLogger:
    def __init__(self, path: str, fieldnames: Iterable[str]):
        self.path = path
        self.fieldnames = list(fieldnames)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        new = not os.path.exists(path)
        self._f = open(path, "a", newline="")
        self._w = csv.DictWriter(self._f, fieldnames=self.fieldnames)
        if new:
            self._w.writeheader()
            self._f.flush()

    def log(self, **row):
        self._w.writerow({k: row.get(k, "") for k in self.fieldnames})
        self._f.flush()

    def close(self):
        self._f.close()
