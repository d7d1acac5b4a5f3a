"""kv-logger with pluggable writers — reference baselines/logger.py
(logkv/logkv_mean/dumpkvs, Human/JSON/CSV/TensorBoard writers :26-170,
OPENAI_LOGDIR/OPENAI_FORMAT env config, ProfileKV/@profile timing
:260-289)."""

from __future__ import annotations

import datetime
import functools
import json
import os
import os.path as osp
import sys
import tempfile
import time
from collections import defaultdict

DEBUG = 10
INFO = 20
WARN = 30
ERROR = 40
DISABLED = 50


class KVWriter:
    def writekvs(self, kvs):
        raise NotImplementedError


class SeqWriter:
    def writeseq(self, seq):
        raise NotImplementedError


class HumanOutputFormat(KVWriter, SeqWriter):
    def __init__(self, filename_or_file):
        if isinstance(filename_or_file, str):
            self.file = open(filename_or_file, "wt")
            self.own_file = True
        else:
            self.file = filename_or_file
            self.own_file = False

    def writekvs(self, kvs):
        key2str = {}
        for key, val in sorted(kvs.items()):
            valstr = "%-8.3g" % val if hasattr(val, "__float__") else str(val)
            key2str[self._trunc(key)] = self._trunc(valstr)
        if not key2str:
            return
        keywidth = max(map(len, key2str.keys()))
        valwidth = max(map(len, key2str.values()))
        dashes = "-" * (keywidth + valwidth + 7)
        lines = [dashes]
        for key, val in sorted(key2str.items()):
            lines.append("| %s%s | %s%s |" % (
                key, " " * (keywidth - len(key)),
                val, " " * (valwidth - len(val))))
        lines.append(dashes)
        self.file.write("\n".join(lines) + "\n")
        self.file.flush()

    @staticmethod
    def _trunc(s, maxlen=30):
        return s[:maxlen - 3] + "..." if len(s) > maxlen else s

    def writeseq(self, seq):
        self.file.write(" ".join(map(str, seq)) + "\n")
        self.file.flush()

    def close(self):
        if self.own_file:
            self.file.close()


class JSONOutputFormat(KVWriter):
    def __init__(self, filename):
        self.file = open(filename, "wt")

    def writekvs(self, kvs):
        out = {k: float(v) if hasattr(v, "__float__") else v
               for k, v in kvs.items()}
        self.file.write(json.dumps(out) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


class CSVOutputFormat(KVWriter):
    def __init__(self, filename):
        self.file = open(filename, "w+t")
        self.keys = []
        self.sep = ","

    def writekvs(self, kvs):
        extra_keys = list(kvs.keys() - self.keys)
        extra_keys.sort()
        if extra_keys:
            self.keys.extend(extra_keys)
            self.file.seek(0)
            lines = self.file.readlines()
            self.file.seek(0)
            self.file.write(self.sep.join(self.keys) + "\n")
            for line in lines[1:]:
                self.file.write(line[:-1]
                                + self.sep * len(extra_keys) + "\n")
        else:
            if self.file.tell() == 0:
                self.file.write(self.sep.join(self.keys) + "\n")
        vals = [kvs.get(k) for k in self.keys]
        self.file.write(self.sep.join(
            "" if v is None else str(v) for v in vals) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


class TensorBoardOutputFormat(KVWriter):
    """tf.summary event files (reference logger.py TensorBoardOutputFormat)."""

    def __init__(self, logdir):
        import tensorflow as tf
        os.makedirs(logdir, exist_ok=True)
        self.tf = tf
        self.writer = tf.summary.create_file_writer(logdir)
        self.step = 1

    def writekvs(self, kvs):
        with self.writer.as_default():
            for k, v in kvs.items():
                if hasattr(v, "__float__"):
                    self.tf.summary.scalar(k, float(v), step=self.step)
        self.writer.flush()
        self.step += 1

    def close(self):
        self.writer.close()


def make_output_format(fmt, ev_dir, log_suffix=""):
    os.makedirs(ev_dir, exist_ok=True)
    if fmt == "stdout":
        return HumanOutputFormat(sys.stdout)
    if fmt == "log":
        return HumanOutputFormat(osp.join(ev_dir, "log%s.txt" % log_suffix))
    if fmt == "json":
        return JSONOutputFormat(osp.join(ev_dir,
                                         "progress%s.json" % log_suffix))
    if fmt == "csv":
        return CSVOutputFormat(osp.join(ev_dir, "progress%s.csv" % log_suffix))
    if fmt == "tensorboard":
        return TensorBoardOutputFormat(osp.join(ev_dir, "tb%s" % log_suffix))
    raise ValueError("Unknown format specified: %s" % (fmt,))


class Logger:
    DEFAULT = None
    CURRENT = None

    def __init__(self, dir, output_formats):
        self.name2val = defaultdict(float)
        self.name2cnt = defaultdict(int)
        self.level = INFO
        self.dir = dir
        self.output_formats = output_formats

    def logkv(self, key, val):
        self.name2val[key] = val

    def logkv_mean(self, key, val):
        if val is None:
            self.name2val[key] = None
            return
        oldval, cnt = self.name2val[key], self.name2cnt[key]
        self.name2val[key] = oldval * cnt / (cnt + 1) + val / (cnt + 1)
        self.name2cnt[key] = cnt + 1

    def dumpkvs(self):
        if self.level == DISABLED:
            return
        for fmt in self.output_formats:
            if isinstance(fmt, KVWriter):
                fmt.writekvs(self.name2val)
        out = dict(self.name2val)
        self.name2val.clear()
        self.name2cnt.clear()
        return out

    def log(self, *args, level=INFO):
        if self.level <= level:
            for fmt in self.output_formats:
                if isinstance(fmt, SeqWriter):
                    fmt.writeseq(map(str, args))

    def set_level(self, level):
        self.level = level

    def get_dir(self):
        return self.dir

    def close(self):
        for fmt in self.output_formats:
            fmt.close()


def configure(dir=None, format_strs=None, log_suffix=""):
    """env-var config mirrors the reference: OPENAI_LOGDIR/OPENAI_LOG_FORMAT
    (also accepts TOYBOX_LOGDIR/TOYBOX_LOG_FORMAT)."""
    if dir is None:
        dir = os.getenv("TOYBOX_LOGDIR") or os.getenv("OPENAI_LOGDIR")
    if dir is None:
        dir = osp.join(tempfile.gettempdir(),
                       datetime.datetime.now().strftime(
                           "toybox-%Y-%m-%d-%H-%M-%S-%f"))
    os.makedirs(dir, exist_ok=True)
    if format_strs is None:
        fmt = os.getenv("TOYBOX_LOG_FORMAT") or os.getenv("OPENAI_LOG_FORMAT")
        format_strs = fmt.split(",") if fmt else ["stdout", "log", "csv"]
    output_formats = [make_output_format(f, dir, log_suffix)
                      for f in format_strs if f]
    Logger.CURRENT = Logger(dir=dir, output_formats=output_formats)
    return Logger.CURRENT


def get_current():
    if Logger.CURRENT is None:
        configure()
    return Logger.CURRENT


def logkv(key, val):
    get_current().logkv(key, val)


def logkv_mean(key, val):
    get_current().logkv_mean(key, val)


def dumpkvs():
    return get_current().dumpkvs()


def log(*args, **kwargs):
    get_current().log(*args, **kwargs)


def get_dir():
    return get_current().get_dir()


# -- timing (reference logger.py:260-289) -----------------------------------

class ProfileKV:
    """Context manager accumulating wall time into wait_<name>."""

    def __init__(self, name):
        self.name = "wait_" + name

    def __enter__(self):
        self.tstart = time.time()

    def __exit__(self, type, value, traceback):
        get_current().name2val[self.name] += time.time() - self.tstart


def profile(name):
    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            with ProfileKV(name):
                return func(*args, **kwargs)
        return wrapper
    return decorator
