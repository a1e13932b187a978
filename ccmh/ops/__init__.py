from ccmh.ops.packing import pack_codes, unpack_codes, sign_codes
from ccmh.ops.hamming import hamming_distance, hamming_distance_packed
from ccmh.ops.map_metric import calc_map, calc_map_4way
from ccmh.ops.similarity import calc_neighbor, cosine_similarity, euclidean_similarity

__all__ = [
    "pack_codes", "unpack_codes", "sign_codes",
    "hamming_distance", "hamming_distance_packed",
    "calc_map", "calc_map_4way",
    "calc_neighbor", "cosine_similarity", "euclidean_similarity",
]
