from . import adj_mat_seer, egnn
