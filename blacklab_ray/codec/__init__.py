from blacklab_ray.codec.vbyte import (
    vbyte_encode, vbyte_decode, delta_encode, delta_decode,
    encode_position_lists, decode_position_lists,
)
from blacklab_ray.codec.smallfloat import (
    int_to_byte4, byte4_to_int, encode_lengths, decode_norms,
)
