from .attention import merge_heads, sdpa, split_heads
from .common import (conv2d, conv2d_init, conv_transpose2d,
                     conv_transpose2d_init, embedding_init, gelu, layer_norm,
                     layer_norm_2d, layer_norm_init, linear, linear_init,
                     max_pool2d, mlp, mlp_init, param_count, trunc_normal,
                     tree_paths)
from .position_encoding import (apply_rope, axial_rope_table, random_pe_coords,
                                random_pe_grid, random_pe_init, sine_pe_1d,
                                sine_pe_2d, tile_rope_table)
from .resize import resize_bicubic_torch, resize_bilinear, resize_nearest
