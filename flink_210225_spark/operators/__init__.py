"""DWD/DWM/DWS operators re-expressed as DataFrame -> DataFrame functions."""
