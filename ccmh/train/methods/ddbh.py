"""DDBH method (TCSVT'25): LinearHash heads + boundary-point loss.  The
reference model/trainer pair is unrunnable as committed (model/DDBH.py:15
NameError, loss.py:7 — recorded bugs); this is the repaired method."""

from ccmh.losses.ddbh import ddbh_loss
from ccmh.train.methods import register
from ccmh.train.methods.base import make_linear_hash_method


def _body(hash_img, hash_txt, label, extra, aux, rng, cfg):
    return ddbh_loss(hash_img, hash_txt, label, cfg.ddbh, cfg.output_dim)


register(make_linear_hash_method("DDBH", _body))
