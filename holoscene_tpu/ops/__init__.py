from holoscene_tpu.ops.embedder import positional_encoding, embedder_out_dim
from holoscene_tpu.ops.density import laplace_density, laplace_beta
from holoscene_tpu.ops.volrend import volume_render_weights, occlusion_opacity
from holoscene_tpu.ops.hashgrid import HashGridMeta, hash_encode, init_hash_embeddings
