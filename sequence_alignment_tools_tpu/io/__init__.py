from .fasta import iter_fasta, read_fasta  # noqa: F401
from .database import SeqDB  # noqa: F401
