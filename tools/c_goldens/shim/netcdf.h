/* stub: the fork's roombinauraliser_internal.h includes netcdf.h
 * unconditionally but never calls NetCDF directly (SOFA loading goes
 * through libsaf's guarded saf_sofa_open_universal). */
