package graft

import java.nio.file.{Files, Paths}

/** Shared Olist-shaped dirty fixture CSVs (FIXTURES.md §A) used by the
  * medallion and lake-orchestration e2e specs. Hand-computed expected
  * values for these fixtures live in MedallionSpec's assertions.
  */
object OlistFixtures {

  private def writeCsv(root: String)(table: String, file: String, header: String, rows: Seq[String]): Unit = {
    val dir = Paths.get(s"$root/ingest/$table")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(file), (header +: rows).mkString("\n"))
  }

  // Olist-shaped fixtures. Two files where cross-file dedup matters;
  // within one AvailableNow batch ingestion_ts ties, so the W1 tiebreak
  // (source_file desc) must make "b_second.csv" win over "a_first.csv".
  def write(root: String): Unit = {
    val writeCsv = this.writeCsv(root) _
    writeCsv("customers", "a_first.csv",
      "customer_id,customer_unique_id,customer_zip_code_prefix,customer_city,customer_state",
      Seq("c1,u1,01310,  sao paulo  ,sp",
        "c2,u2,20000,rio,rj",
        ",u3,30000,bh,mg")) // null PK -> dropped
    writeCsv("customers", "b_second.csv",
      "customer_id,customer_unique_id,customer_zip_code_prefix,customer_city,customer_state",
      Seq("c1,u1,01310,sao paulo centro,SP")) // dup PK -> this one wins

    writeCsv("geolocation", "a_first.csv",
      "geolocation_zip_code_prefix,geolocation_lat,geolocation_lng,geolocation_city,geolocation_state",
      Seq("01310,-23.55,-46.63,sao paulo,sp",
        "01310,-23.56,-46.64,sao paulo,sp",
        "01310,-23.57,-46.65,osasco,sp", // minority city loses the mode vote
        "20000,-22.90,-43.20,rio,rj",
        "30000,,-43.90,bh,mg")) // null lat -> dropped

    writeCsv("order_items", "a_first.csv",
      "order_id,order_item_id,product_id,seller_id,shipping_limit_date,price,freight_value",
      Seq("o1,1,p1,s1,2017-01-01 10:00:00,100.0,10.0",
        "o1,2,p1,s1,2017-01-01 10:00:00,50.0,5.0",
        "o2,1,p2,s2,2017-01-02 10:00:00,200.0,20.0",
        "o9,1,p1,s1,2017-01-03 10:00:00,abc,5.0")) // corrupt price -> dropped
    writeCsv("order_items", "b_second.csv",
      "order_id,order_item_id,product_id,seller_id,shipping_limit_date,price,freight_value",
      Seq("o1,1,p1,s1,2017-01-01 10:00:00,120.0,12.0")) // dup composite PK -> wins

    writeCsv("order_payments", "a_first.csv",
      "order_id,payment_sequential,payment_type,payment_installments,payment_value",
      Seq("o1,1,credit_card,3,150.00",
        "o1,2,voucher,,20.00", // null installments -> default 1
        "o2,1,CREDIT_CARD,1,220.00", // type lowercased
        "o2,2,boleto,1,abc")) // corrupt value -> dropped

    writeCsv("order_reviews", "a_first.csv",
      "review_id,order_id,review_score,review_comment_title,review_comment_message,review_creation_date,review_answer_timestamp",
      Seq("r1,o1,5,  Great  ,ok,2017-01-05 10:00:00,2017-01-06 10:00:00",
        "r2,o2,9,t,m,2017-01-06 10:00:00,2017-01-07 10:00:00", // score out of range
        "r3,o2,4,t,m,not-a-date,2017-01-07 10:00:00", // corrupt creation ts
        "r4,o2,3,t,m,2017-01-06 11:00:00,2017-01-07 10:00:00"))
    writeCsv("order_reviews", "b_second.csv",
      "review_id,order_id,review_score,review_comment_title,review_comment_message,review_creation_date,review_answer_timestamp",
      Seq("r1,o1,4,Edited,ok,2017-01-05 10:00:00,2017-01-06 10:00:00")) // dup -> wins

    writeCsv("orders", "a_first.csv",
      "order_id,customer_id,order_status,order_purchase_timestamp,order_approved_at,order_delivered_carrier_date,order_delivered_customer_date,order_estimated_delivery_date",
      Seq("o1,c1,delivered,2017-01-01 08:00:00,2017-01-01 09:00:00,2017-01-02 08:00:00,2017-01-04 08:00:00,2017-01-10 00:00:00",
        "o2,c2,shipped,2017-01-02 08:00:00,2017-01-02 09:00:00,2017-01-03 08:00:00,,2017-01-09 00:00:00",
        "o3,c1,bogus_status,2017-01-03 08:00:00,,,,", // invalid status -> dropped
        "o4,c2,delivered,bad-ts,,,,")) // corrupt purchase ts -> dropped

    writeCsv("products", "a_first.csv",
      "product_id,product_category_name,product_name_lenght,product_description_lenght,product_photos_qty,product_weight_g,product_length_cm,product_height_cm,product_width_cm",
      Seq("p1,Eletronicos,10,100,1,500,20,10,5",
        "p2,MOVEIS,5,50,2,abc,30,20,10")) // corrupt weight -> NULL, row kept

    writeCsv("sellers", "a_first.csv",
      "seller_id,seller_zip_code_prefix,seller_city,seller_state",
      Seq("s1,01310,  sao paulo ,sp",
        "s2,20000,rio,rj"))
  }

}
