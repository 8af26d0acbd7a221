from .fasta import data_type_of, read_records, read_fof
from .writers import GzTextWriter, format_double
