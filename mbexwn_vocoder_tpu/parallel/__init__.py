from .mesh import make_mesh, data_sharding, replicated
from .batch import BatchSynthesizer
from .streaming import StreamingSynthesizer
