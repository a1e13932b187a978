"""DNpH method (TMM'24): LinearHash heads + QSMI loss
(train/DNpH_TMM/hash_train.py:61-70)."""

from ccmh.losses.dnph_tmm import qmi_loss
from ccmh.train.methods import register
from ccmh.train.methods.base import make_linear_hash_method


def _body(hash_img, hash_txt, label, extra, aux, rng, cfg):
    return qmi_loss(hash_img, hash_txt, label)


register(make_linear_hash_method("DNpH", _body))
