* LP exercising BOUNDS variants and RANGES:
*   min x1 + x2 + x3
*   s.t. R1: 1 <= x1 + x2 + x3 <= 3   (G row with RANGES)
*        R2: x1 - x3 = 0.5            (E row)
*   x1 in [0, 2], x2 free, x3 >= -1
* optimum: minimize sum at sum = 1 with x1 - x3 = 0.5 -> f = 1
NAME          BNDRNG
ROWS
 N  OBJ
 G  R1
 E  R2
COLUMNS
    X1        OBJ       1.0        R1        1.0
    X1        R2        1.0
    X2        OBJ       1.0        R1        1.0
    X3        OBJ       1.0        R1        1.0
    X3        R2        -1.0
RHS
    RHS       R1        1.0        R2        0.5
RANGES
    RNG       R1        2.0
BOUNDS
 UP BND       X1        2.0
 FR BND       X2
 LO BND       X3        -1.0
 MI BND       X3
ENDATA
