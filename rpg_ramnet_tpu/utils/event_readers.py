"""Streaming raw-event readers for text / zipped event files.

Capability reference: RAM_Net/utils/event_readers.py (FixedSizeEventReader:8
— pandas chunked fixed-count windows; FixedDurationEventReader:32 —
fixed-duration windows from .txt or .zip event logs).  These feed the live
streaming demo path; file rows are "t x y p".
"""
from __future__ import annotations

import zipfile
from typing import Iterator, Optional

import numpy as np


class FixedSizeEventReader:
    """Iterates fixed-count [N x 4] event windows from a txt(.zip) log."""

    def __init__(self, path_to_event_file: str, num_events: int = 10000,
                 start_index: int = 0):
        import pandas as pd
        self._iterator = pd.read_csv(
            path_to_event_file, sep=r"\s+", header=None,
            names=["t", "x", "y", "pol"],
            dtype={"t": np.float64, "x": np.int16, "y": np.int16, "pol": np.int16},
            engine="c", skiprows=start_index + 1, chunksize=num_events,
            nrows=None, memory_map=True)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        chunk = self._iterator.__next__()
        return chunk.values


class FixedDurationEventReader:
    """Iterates fixed-duration windows (default 50 ms) of events.

    Supports plain text files and single-member .zip archives, mirroring the
    reference (event_readers.py:32-88)."""

    def __init__(self, path_to_event_file: str, duration_ms: float = 50.0,
                 start_index: int = 0):
        self._is_zip = path_to_event_file.endswith(".zip")
        if self._is_zip:
            self._zip = zipfile.ZipFile(path_to_event_file)
            files = self._zip.namelist()
            assert len(files) == 1
            self._file = self._zip.open(files[0], "r")
        else:
            self._zip = None
            self._file = open(path_to_event_file, "rb")
        for _ in range(start_index + 1):  # skip header + start offset
            self._file.readline()
        self.duration_s = duration_ms / 1000.0
        self.last_stamp: Optional[float] = None

    def __iter__(self):
        return self

    def __del__(self):
        try:
            if self._zip is not None:
                self._zip.close()
            self._file.close()
        except Exception:
            pass

    def __next__(self) -> np.ndarray:
        event_list = []
        for line in self._file:
            if self._is_zip:
                line = line.decode("utf-8")
            elif isinstance(line, bytes):
                line = line.decode("utf-8")
            t, x, y, pol = line.split(" ")
            t, x, y, pol = float(t), int(x), int(y), int(pol)
            event_list.append([t, x, y, pol])
            if self.last_stamp is None:
                self.last_stamp = t
            if t > self.last_stamp + self.duration_s:
                self.last_stamp = t
                return np.array(event_list)
        raise StopIteration
