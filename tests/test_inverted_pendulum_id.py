"""Closed-loop gain identification pipeline test (the reference's
flagship app, SURVEY.md section 3.4): Kane's-method EoMs + LQR +
noisy closed-loop simulation + collocation identification."""

import runpy
import sys

import numpy as np
import pytest


def test_gain_identification(capsys, monkeypatch):
    monkeypatch.setattr(sys, 'argv',
                        ['x', '--links', '1', '--nodes', '201',
                         '--noise', '0.005'])
    runpy.run_path('examples/inverted_pendulum_id.py',
                   run_name='__main__')
    out = capsys.readouterr().out
    assert 'max error' in out
    err = float(out.split('max error:')[1].split()[0])
    assert err < 1.0  # gains recovered to noise-limited accuracy
