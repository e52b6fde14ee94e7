from .irradiation import b_star, f_toa
